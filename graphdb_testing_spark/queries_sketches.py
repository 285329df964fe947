"""Sketch-based approximate queries with exact (bit-identical)
DuckDB oracles: the sketch state is deterministic on the portable
hash, so even the *estimate* is hash-checkable — the correctness gate
covers the approximation machinery itself, not just an exact twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import datasets
from .functions import sketches
from .queries import register

# ---------------------------------------------------------------------------
# HyperLogLog distinct users per event type (deterministic registers)
# ---------------------------------------------------------------------------

_HLL_ORACLE = (
    "WITH "
    + sketches.hll_oracle_sql("events", "event_type", "user_id").strip()
    + """,
exact AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
)
SELECT e.event_type, e.n_exact, h.est_milli
FROM exact e JOIN hll h USING (event_type)
"""
)


@register("hll_distinct_users", _HLL_ORACLE)
def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type, exact vs the 64-register
    HyperLogLog estimate (:mod:`functions.sketches`).  The register
    state is a map-side-combining ``groupBy(key, register).max`` —
    at 100 TB the shuffle carries ≤ 64 rows per key while the exact
    countDistinct re-shuffles every raw value; the oracle checks the
    estimate bit-for-bit because the hash, the rank ladder, and the
    Σ2^-rho arithmetic are all engine-exact."""
    ev = datasets.load_table(spark, sf_dir, "events")
    regs = sketches.hll_registers(ev, ["event_type"], "user_id")
    est = sketches.hll_estimate(regs, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return exact.join(est, "event_type").select(
        "event_type", "n_exact", "est_milli"
    )


# ---------------------------------------------------------------------------
# single-pass equi-width histogram quantiles vs exact order statistics
# ---------------------------------------------------------------------------

_NBINS = 1000
_HISTQ_ORACLE = f"""
WITH stats AS (
  SELECT event_type, MIN(value) AS mn, MAX(value) AS mx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type
),
bins AS (
  SELECT e.event_type,
         LEAST(CAST(FLOOR((e.value - s.mn) * {_NBINS}.0 / (s.mx - s.mn)) AS BIGINT),
               {_NBINS - 1}) AS bin,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events e JOIN stats s USING (event_type)
  GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bin, SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum
  FROM bins
),
targets AS (
  SELECT s.event_type, p.p_milli,
         CAST(CEIL(s.n * p.p_milli / 1000.0) AS BIGINT) AS rank, s.mn, s.mx, s.n
  FROM stats s CROSS JOIN (VALUES (500), (950), (990)) AS p(p_milli)
),
approx AS (
  SELECT t.event_type, t.p_milli,
         MIN(c.bin) AS qbin, ANY_VALUE(t.mn) AS mn, ANY_VALUE(t.mx) AS mx
  FROM targets t JOIN cum c
    ON c.event_type = t.event_type AND c.cum >= t.rank
  GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn
  FROM events
),
exact AS (
  SELECT t.event_type, t.p_milli, r.value AS exact_val
  FROM targets t JOIN ranked r
    ON r.event_type = t.event_type AND r.rn = t.rank
)
SELECT a.event_type, CAST(a.p_milli AS BIGINT) AS p_milli, a.qbin,
       ROUND(a.mn + a.qbin * (a.mx - a.mn) / {_NBINS}.0, 6) AS approx_q,
       ROUND(e.exact_val, 6) AS exact_q
FROM approx a JOIN exact e USING (event_type, p_milli)
"""


@register("histogram_quantiles", _HISTQ_ORACLE)
def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a single-pass 1000-bin equi-width
    histogram (the classic fixed-state quantile sketch: state is
    O(bins) per key however large the input), side-by-side with the
    exact order statistic.  Bin arithmetic is one IEEE multiply +
    divide + floor, so the sketch — like the HLL above — is
    bit-deterministic and hash-checkable.  At 100 TB the histogram is
    a map-side-combining groupBy; the exact path's per-key global sort
    is the thing the sketch exists to avoid."""
    ev = datasets.load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    stats = ev.groupBy("event_type").agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.count("*").cast("long").alias("n"),
    )
    bins = (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            F.least(
                F.floor(
                    (F.col("value") - F.col("mn"))
                    * F.lit(float(_NBINS))
                    / (F.col("mx") - F.col("mn"))
                ).cast("long"),
                F.lit(_NBINS - 1),
            ).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count("*").cast("long").alias("c"))
    )
    cum = bins.withColumn(
        "cum", F.sum("c").over(Window.partitionBy("event_type").orderBy("bin"))
    )
    ps = F.explode(F.array(*[F.lit(p) for p in (500, 950, 990)])).alias("p_milli")
    targets = stats.select("event_type", "mn", "mx", "n", ps).withColumn(
        "rank", F.ceil(F.col("n") * F.col("p_milli") / F.lit(1000.0)).cast("long")
    )
    approx = (
        targets.join(cum, "event_type")
        .filter(F.col("cum") >= F.col("rank"))
        .groupBy("event_type", "p_milli")
        .agg(
            F.min("bin").alias("qbin"),
            F.first("mn").alias("mn"),
            F.first("mx").alias("mx"),
        )
    )
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("value"))
        .alias("rn"),
    )
    exact = targets.join(
        ranked,
        (targets.event_type == ranked.event_type) & (ranked.rn == targets.rank),
    ).select(targets.event_type, "p_milli", F.col("value").alias("exact_val"))
    return (
        approx.join(exact, ["event_type", "p_milli"])
        .select(
            "event_type",
            F.col("p_milli").cast("long").alias("p_milli"),
            "qbin",
            F.round(
                F.col("mn") + F.col("qbin") * (F.col("mx") - F.col("mn")) / F.lit(float(_NBINS)),
                6,
            ).alias("approx_q"),
            F.round("exact_val", 6).alias("exact_q"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter join pruning (k=2, m=8192) with measured false positives
# ---------------------------------------------------------------------------

_BLOOM_M = 8192


def _bloom_h(salt: str, expr: str) -> str:
    return (
        f"('0x' || substr(md5('{salt}|' || CAST({expr} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {_BLOOM_M}"
    )


_BLOOM_ORACLE = f"""
WITH build AS (SELECT DISTINCT o_custkey AS k FROM orders),
bits AS MATERIALIZED (
  SELECT {_bloom_h("bloom1", "k")} AS pos FROM build
  UNION
  SELECT {_bloom_h("bloom2", "k")} AS pos FROM build
),
probe AS (
  SELECT c_custkey AS k,
         {_bloom_h("bloom1", "c_custkey")} AS h1,
         {_bloom_h("bloom2", "c_custkey")} AS h2
  FROM customer
),
flags AS (
  SELECT p.k,
         CAST(p.h1 IN (SELECT pos FROM bits)
              AND p.h2 IN (SELECT pos FROM bits) AS BIGINT) AS maybe,
         CAST(p.k IN (SELECT k FROM build) AS BIGINT) AS truly
  FROM probe p
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(truly) AS BIGINT) AS n_true_members,
       CAST(SUM(maybe) AS BIGINT) AS n_maybe,
       CAST(SUM(CASE WHEN maybe = 1 AND truly = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_positives,
       CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS n_set_bits
FROM flags
"""


@register("bloom_prune_stats", _BLOOM_ORACLE)
def q_bloom_prune_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning, measured: build a k=2/m=8192
    filter over ``orders.o_custkey``, probe every customer, and report
    the true-member / maybe / false-positive split plus filter
    occupancy.  The filter here is its position-set relational form
    (≤ m rows, broadcastable); the packed-words physical form is a
    trivial re-encoding — what the oracle certifies is the hash/bit
    math and the measured FP rate that makes runtime join pruning
    (Spark's own ``spark.sql.optimizer.runtime.bloomFilter``) safe to
    reason about."""
    from .hashutil import hash_mod

    orders = datasets.load_table(spark, sf_dir, "orders")
    cust = datasets.load_table(spark, sf_dir, "customer")
    build = orders.select(F.col("o_custkey").alias("k")).distinct()
    bits = (
        build.select(hash_mod("bloom1", [F.col("k")], F.lit(_BLOOM_M)).alias("pos"))
        .unionAll(
            build.select(hash_mod("bloom2", [F.col("k")], F.lit(_BLOOM_M)).alias("pos"))
        )
        .distinct()
        .localCheckpoint()
    )
    probe = cust.select(
        F.col("c_custkey").alias("k"),
        hash_mod("bloom1", [F.col("c_custkey")], F.lit(_BLOOM_M)).alias("h1"),
        hash_mod("bloom2", [F.col("c_custkey")], F.lit(_BLOOM_M)).alias("h2"),
    )
    b1 = bits.select(F.col("pos").alias("h1")).withColumn("f1", F.lit(1))
    b2 = bits.select(F.col("pos").alias("h2")).withColumn("f2", F.lit(1))
    truth = build.withColumn("t", F.lit(1))
    flags = (
        probe.join(F.broadcast(b1), "h1", "left")
        .join(F.broadcast(b2), "h2", "left")
        .join(truth, "k", "left")
        .select(
            (F.col("f1").isNotNull() & F.col("f2").isNotNull())
            .cast("long")
            .alias("maybe"),
            F.col("t").isNotNull().cast("long").alias("truly"),
        )
    )
    n_bits = bits.select(F.count("*").cast("long").alias("n_set_bits"))
    return (
        flags.agg(
            F.count("*").cast("long").alias("n_probes"),
            F.sum("truly").cast("long").alias("n_true_members"),
            F.sum("maybe").cast("long").alias("n_maybe"),
            F.sum(((F.col("maybe") == 1) & (F.col("truly") == 0)).cast("long"))
            .cast("long")
            .alias("n_false_positives"),
        )
        .crossJoin(n_bits)
    )


# ---------------------------------------------------------------------------
# order-independent content digests (pipeline integrity checks)
# ---------------------------------------------------------------------------

_DIGEST_ORACLE = """
WITH ev AS (
  SELECT ('0x' || substr(md5('dg|' || event_id::VARCHAR || '|' ||
          user_id::VARCHAR || '|' || event_type), 1, 15))::BIGINT AS h
  FROM events
),
od AS (
  SELECT ('0x' || substr(md5('dg|' || o_orderkey::VARCHAR || '|' ||
          o_custkey::VARCHAR || '|' || o_orderstatus), 1, 15))::BIGINT AS h
  FROM orders
),
li AS (
  SELECT ('0x' || substr(md5('dg|' || l_orderkey::VARCHAR || '|' ||
          l_linenumber::VARCHAR || '|' || l_partkey::VARCHAR || '|' ||
          l_suppkey::VARCHAR), 1, 15))::BIGINT AS h
  FROM lineitem
)
SELECT 'events' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(h) AS BIGINT) AS digest FROM ev
UNION ALL
SELECT 'orders', CAST(COUNT(*) AS BIGINT), CAST(bit_xor(h) AS BIGINT) FROM od
UNION ALL
SELECT 'lineitem', CAST(COUNT(*) AS BIGINT), CAST(bit_xor(h) AS BIGINT) FROM li
"""


@register("table_digests", _DIGEST_ORACLE)
def q_table_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content digest per table: XOR of 60-bit row
    digests over the key columns — the data-level analog of the
    reference's ``consistency_check``.  XOR is associative/commutative
    and width-preserving, so the digest computes in one map-side-
    combining pass with no sort at any scale, and any single-row
    corruption flips it.  (Key columns only: float/timestamp
    formatting is engine-specific, integers and strings are not.)"""
    from .hashutil import hash_prefix

    def digest(df: DataFrame, name: str, cols: list[str]) -> DataFrame:
        h = hash_prefix(
            F.concat_ws("|", F.lit("dg"), *[F.col(c).cast("string") for c in cols]),
            15,
        )
        return df.select(h.alias("h")).agg(
            F.lit(name).alias("tbl"),
            F.count("*").cast("long").alias("n_rows"),
            F.expr("bit_xor(h)").cast("long").alias("digest"),
        )

    ev = datasets.load_table(spark, sf_dir, "events")
    od = datasets.load_table(spark, sf_dir, "orders")
    li = datasets.load_table(spark, sf_dir, "lineitem")
    return (
        digest(ev, "events", ["event_id", "user_id", "event_type"])
        .unionAll(digest(od, "orders", ["o_orderkey", "o_custkey", "o_orderstatus"]))
        .unionAll(
            digest(li, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"])
        )
    )


# ---------------------------------------------------------------------------
# HLL set algebra: intersection cardinality via inclusion-exclusion
# ---------------------------------------------------------------------------

_HLL_IX_ORACLE = (
    "WITH "
    + sketches.hll_oracle_sql(
        "(SELECT 'click' AS side, user_id FROM events WHERE event_type = 'click'"
        " UNION ALL"
        " SELECT 'purchase', user_id FROM events WHERE event_type = 'purchase')",
        "side",
        "user_id",
    ).strip()
    + """,
union_regs AS (
  SELECT register, MAX(max_rho) AS max_rho FROM regs GROUP BY register
),
union_est AS (
  SELECT CAST(FLOOR(1000.0 * 0.709 * 4096 /
    ((64 - COUNT(*)) + SUM(POWER(2e0, -max_rho)))) AS BIGINT) AS u_milli
  FROM union_regs
),
sides AS (
  SELECT MAX(CASE WHEN side = 'click' THEN est_milli END) AS a_milli,
         MAX(CASE WHEN side = 'purchase' THEN est_milli END) AS b_milli
  FROM hll
),
exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM (
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase')
)
SELECT s.a_milli, s.b_milli, u.u_milli,
       s.a_milli + s.b_milli - u.u_milli AS inter_est_milli,
       e.n_exact
FROM sides s CROSS JOIN union_est u CROSS JOIN exact e
"""
)


@register("hll_join_cardinality", _HLL_IX_ORACLE)
def q_hll_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch set-algebra: |A∩B| ≈ est(A) + est(B) − est(A∪B), where
    est(A∪B) comes from register-wise MAX of the two sketches — the
    join-cardinality estimation a cost-based planner runs before
    choosing a strategy, here exactly reproducible (integer milli
    estimates) next to the exact intersection."""
    ev = datasets.load_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        F.col("event_type").alias("side"), "user_id"
    )
    regs = sketches.hll_registers(tagged, ["side"], "user_id").localCheckpoint()
    est = sketches.hll_estimate(regs, ["side"])
    union_regs = regs.groupBy("register").agg(F.max("max_rho").alias("max_rho"))
    union_est = sketches.hll_estimate(
        union_regs.withColumn("k", F.lit(1)), ["k"]
    ).select(F.col("est_milli").alias("u_milli"))
    sides = est.groupBy().agg(
        F.max(F.when(F.col("side") == "click", F.col("est_milli"))).alias("a_milli"),
        F.max(F.when(F.col("side") == "purchase", F.col("est_milli"))).alias("b_milli"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    exact = clicks.join(purch, "user_id").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    return (
        sides.crossJoin(F.broadcast(union_est))
        .crossJoin(F.broadcast(exact))
        .select(
            "a_milli",
            "b_milli",
            "u_milli",
            (F.col("a_milli") + F.col("b_milli") - F.col("u_milli")).alias(
                "inter_est_milli"
            ),
            "n_exact",
        )
    )


# ---------------------------------------------------------------------------
# Count-Min sketch point estimates vs exact counts (heavy hitters)
# ---------------------------------------------------------------------------

_CMS_ORACLE = (
    "WITH "
    + sketches.cms_oracle_sql("events", "user_id", depth=4, width=512)
    + """,
cms_true AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM events GROUP BY user_id
),
cms_top AS (
  SELECT user_id, true_count,
         ROW_NUMBER() OVER (ORDER BY true_count DESC, user_id) AS rnk
  FROM cms_true
),
cms_probe AS (
  SELECT p.user_id, p.true_count, p.rnk, t.r,
         ('0x' || substr(md5('cms|' || t.r::VARCHAR || '|' ||
                              CAST(p.user_id AS VARCHAR)), 1, 8))::BIGINT
           % 512 AS idx
  FROM cms_top p, UNNEST([0, 1, 2, 3]) t(r)
  WHERE p.rnk <= 20
)
SELECT p.user_id, p.true_count,
       CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS cms_estimate,
       CAST(p.rnk AS BIGINT) AS rank
FROM cms_probe p LEFT JOIN cms_counters c ON c.r = p.r AND c.idx = p.idx
GROUP BY p.user_id, p.true_count, p.rnk
"""
)


@register("cms_heavy_hitters", _CMS_ORACLE)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (depth 4 × width 512, portable md5 hashes)
    point estimates for the 20 highest-frequency users, alongside
    their exact counts — the constant-memory frequency sketch the
    reference-era streaming systems pair with heavy-hitter queries.
    Build is one explode + a ≤ 2048-group partial-agg shuffle
    (constant regardless of stream length, counter-wise mergeable
    across partitions); estimates obey ``cms_estimate ≥ true_count``
    by construction (one-sided error)."""
    ev = datasets.load_table(spark, sf_dir, "events")
    counters = sketches.cms_counters(ev, "user_id", depth=4, width=512)
    true = ev.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.count("*").cast("long").alias("true_count")
    )
    from pyspark.sql import Window

    # top-k via orderBy().limit → TakeOrderedAndProject over the
    # O(users) count table (no single-task global sort); the rank
    # window then runs over exactly 20 rows
    top20 = true.orderBy(F.desc("true_count"), "user_id").limit(20)
    w = Window.orderBy(F.desc("true_count"), "user_id")  # 20 rows
    top = top20.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).localCheckpoint()
    est = sketches.cms_point_estimates(
        counters, top.select("user_id"), "user_id", depth=4, width=512
    )
    return top.join(F.broadcast(est), "user_id").select(
        "user_id", "true_count", "cms_estimate", "rank"
    )


# ---------------------------------------------------------------------------
# KMV (bottom-k) distinct sketch vs exact distinct counts
# ---------------------------------------------------------------------------

_KMV_ORACLE = """
WITH kh AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5('kmv|' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM events
),
krk AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM kh
),
kbot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_kept,
         MAX(CASE WHEN rn = 64 THEN h END) AS h64
  FROM krk WHERE rn <= 64 GROUP BY event_type
),
kex AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
)
SELECT e.event_type, e.n_exact,
       CAST(CASE WHEN b.n_kept < 64 THEN b.n_kept
                 ELSE (63 * 4294967296) // b.h64 END AS BIGINT) AS kmv_estimate
FROM kex e JOIN kbot b USING (event_type)
"""


@register("kmv_distinct_users", _KMV_ORACLE)
def q_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / bottom-k distinct sketch (Bar-Yossef et al., RANDOM'02):
    keep the 64 smallest distinct 32-bit hashes per event type;
    ``(k−1)·2³² / h_k`` estimates the distinct count (exact below k).
    The HLL sibling with a different merge law — bottom-k union is
    just a re-min over the union of the two bottom sets, all integer,
    so the sketch is checkable bit-for-bit.  Build is one distinct +
    one bounded per-key top-k; state is ≤ 64 rows per key forever."""
    from .hashutil import hash_prefix
    from pyspark.sql import Window

    ev = datasets.load_table(spark, sf_dir, "events")
    kh = ev.select(
        "event_type",
        hash_prefix(
            F.concat_ws("|", F.lit("kmv"), F.col("user_id").cast("string")), 8
        ).alias("h"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    bot = (
        kh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 64)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.max(F.when(F.col("rn") == 64, F.col("h"))).alias("h64"),
        )
    )
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return ex.join(F.broadcast(bot), "event_type").select(
        "event_type",
        "n_exact",
        F.when(F.col("n_kept") < 64, F.col("n_kept"))
        .otherwise(F.expr("(63 * 4294967296) div h64"))
        .cast("long")
        .alias("kmv_estimate"),
    )
