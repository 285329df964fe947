"""Graph-ops + text coverage queries: physmap (M8), adjacency export
(F3/S13), CSR offsets (S13), timestamped merge + time-range scans
(M6, F5/F6), quality scoring, winnowing fingerprints, and word-n-gram
Jaccard dedup.  Each entry has a DuckDB oracle with identical column
names/values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import datasets, oracles
from .functions import dedup, textstats
from .operators import physmap
from .operators import updates as upd
from .queries import register

# ---------------------------------------------------------------------------
# M8: physical-ID map (string names → dense vertex ids)
# ---------------------------------------------------------------------------


@register(
    "physmap_supplier_ids",
    """
SELECT name, CAST(ROW_NUMBER() OVER (ORDER BY name) - 1 AS BIGINT) AS vid
FROM (SELECT DISTINCT s_name AS name FROM supplier)
""",
)
def q_physmap_supplier_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense deterministic id assignment for string vertex names —
    the reference's physmap (``src/core/stinger-physmap.c:82-110``)
    as a dimension table built with distributed ``zipWithIndex``."""
    sup = datasets.load_table(spark, sf_dir, "supplier")
    return physmap.build_physmap(sup.select(F.col("s_name").alias("name")))


# ---------------------------------------------------------------------------
# F3 / S13: gather-neighbors (adjacency export) and CSR offsets
# ---------------------------------------------------------------------------


@register(
    "adjacency_lists",
    oracles.with_edges(
        """
SELECT src AS id, COUNT(*) AS degree,
       string_agg(dst::VARCHAR, ',' ORDER BY dst) AS neighbors
FROM edges GROUP BY src
"""
    ),
)
def q_adjacency_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gather-successors (``stinger_gather_successors``,
    ``include/stinger.h:197-223``) / edge-list→CSR conversion
    (``stinger-utils.c:651-708``): per-vertex sorted neighbor list.
    One partial-aggregating groupBy; the list is exported as a
    comma-joined string for cross-engine comparison."""
    g = datasets.part_supplier_graph(spark, sf_dir)
    return g.edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("degree"),
        F.array_join(
            F.expr("transform(sort_array(collect_list(dst)), x -> cast(x as string))"),
            ",",
        ).alias("neighbors"),
    )


@register(
    "csr_offsets",
    oracles.with_edges(
        """
SELECT id, degree,
       CAST(COALESCE(SUM(degree) OVER (ORDER BY id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
FROM (SELECT src AS id, COUNT(*) AS degree FROM edges GROUP BY src)
"""
    ),
)
def q_csr_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSR offset array via prefix sum (``rmatter.c:23-69``,
    ``stinger_to_sorted_csr`` ``stinger-utils.c:439-499``) — computed
    with the two-level range-partitioned scan
    (:func:`operators.prefix.range_prefix_sum`), so the only global
    window runs over one row per range partition instead of a
    single-task sort of all vertices."""
    from .operators import prefix

    g = datasets.part_supplier_graph(spark, sf_dir)
    # materialize the (small, O(nv)) degree table once: range
    # repartitioning samples its input, which would otherwise re-run
    # the whole co-occurrence derivation a second time
    deg = (
        g.edges.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("degree"))
        .localCheckpoint()
    )
    return prefix.range_prefix_sum(deg, "id", "degree", "off").select(
        "id", "degree", "off"
    )


# ---------------------------------------------------------------------------
# M6 + F5/F6: timestamped merge and MODIFIED_AFTER scan
# ---------------------------------------------------------------------------

_GUARD = -(2**62)

_TIMED_ORACLE = f"""
WITH {oracles.ACTIONS_CTE.strip()},
decoded AS (
  SELECT seq,
         CASE WHEN src < 0 THEN -src - 1 ELSE src END AS u,
         CASE WHEN src < 0 THEN -dst - 1 ELSE dst END AS v,
         weight, src < 0 AS is_del, epoch_us(ts) AS us
  FROM actions
),
bidir AS (
  SELECT seq, u AS src, v AS dst, weight, is_del, us FROM decoded WHERE u <> v
  UNION ALL
  SELECT seq, v AS src, u AS dst, weight, is_del, us FROM decoded WHERE u <> v
),
keyed AS (
  SELECT *, MAX(CASE WHEN is_del THEN seq END)
              OVER (PARTITION BY src, dst) AS last_del
  FROM bidir
),
folded AS (
  SELECT src, dst,
         CAST(SUM(CASE WHEN NOT is_del AND seq > COALESCE(last_del, {_GUARD})
                       THEN weight END) AS BIGINT) AS wgt,
         MIN(CASE WHEN NOT is_del AND seq > COALESCE(last_del, {_GUARD})
                  THEN us END) AS time_first,
         MAX(CASE WHEN NOT is_del AND seq > COALESCE(last_del, {_GUARD})
                  THEN us END) AS time_recent
  FROM keyed GROUP BY 1, 2
),
thr AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS t FROM events)
SELECT src, dst, wgt, time_first, time_recent
FROM folded, thr
WHERE wgt IS NOT NULL AND wgt > 0 AND time_recent >= t
"""


@register("edges_modified_after", _TIMED_ORACLE)
def q_edges_modified_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a timestamped edge table from the action stream
    (``time_first``/``time_recent`` per edge,
    ``stinger-internal.h:52-58``) and scan edges MODIFIED_AFTER the
    stream midpoint (``include/stinger.h:312-315``) — the reference's
    filtered-iterator surface as pushdown-friendly predicates."""
    acts = datasets.actions_stream(spark, sf_dir)
    edges = upd.apply_actions_timed(None, acts)
    lo, hi = (
        datasets.load_table(spark, sf_dir, "events")
        .agg(F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts")))
        .collect()[0]
    )
    return upd.modified_after(edges, (lo + hi) // 2)


# ---------------------------------------------------------------------------
# quality scoring (Gopher/C4-style rule filter)
# ---------------------------------------------------------------------------

_QUALITY_ORACLE = """
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
  ) WHERE tok <> ''
),
per AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         ROUND(AVG(LEN(tok)), 6) AS avg_token_len,
         CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct_tokens
  FROM toks GROUP BY doc_id
),
s AS (
  SELECT d.doc_id,
         COALESCE(p.n_tokens, 0) AS n_tokens,
         COALESCE(p.avg_token_len, 0e0) AS avg_token_len,
         ROUND(COALESCE(p.n_distinct_tokens / (1e0 * p.n_tokens), 0e0), 6) AS dr
  FROM documents d LEFT JOIN per p USING (doc_id)
)
SELECT doc_id,
       ROUND(((CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 1e0 ELSE 0e0 END)
            + (CASE WHEN avg_token_len >= 2.0 AND avg_token_len <= 12.0
                    THEN 1e0 ELSE 0e0 END)
            + LEAST(dr * 2, 1e0)) / 3e0, 6) AS quality
FROM s
"""


@register("quality_scores", _QUALITY_ORACLE)
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = datasets.load_table(spark, sf_dir, "documents")
    return textstats.quality_score(docs)


# ---------------------------------------------------------------------------
# winnowing-style document fingerprint
# ---------------------------------------------------------------------------

_FINGERPRINT_ORACLE = """
WITH sh AS (
  SELECT DISTINCT doc_id, substr(text, i, 8) AS sh
  FROM documents, UNNEST(generate_series(1, len(text) - 7)) AS t(i)
  WHERE len(text) >= 8
),
h AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM sh
),
rk AS (
  SELECT doc_id, h, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h) AS rn FROM h
)
SELECT doc_id, string_agg(h::VARCHAR, '-' ORDER BY h) AS fingerprint
FROM rk WHERE rn <= 4 GROUP BY doc_id
"""


@register("doc_fingerprints", _FINGERPRINT_ORACLE)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-robust rolling-hash fingerprint: 4 smallest distinct
    32-bit hashes of the document's 8-grams."""
    docs = datasets.load_table(spark, sf_dir, "documents")
    return textstats.fingerprint(docs, k=8, keep=4)


# ---------------------------------------------------------------------------
# word n-gram Jaccard near-dup pairs
# ---------------------------------------------------------------------------

_NGRAM_ORACLE = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
ng AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i + 2), ' ') AS ng
  FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0))) AS s(i)
),
dfc AS (SELECT ng FROM (SELECT ng, COUNT(*) AS df FROM ng GROUP BY ng) WHERE df <= 20),
rare AS (SELECT g.* FROM ng g JOIN dfc USING (ng)),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM rare a JOIN rare b ON a.ng = b.ng AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ng GROUP BY doc_id),
inter AS (
  SELECT c.a_id, c.b_id, CAST(COUNT(*) AS BIGINT) AS inter
  FROM cand c
  JOIN ng ga ON ga.doc_id = c.a_id
  JOIN ng gb ON gb.doc_id = c.b_id AND gb.ng = ga.ng
  GROUP BY 1, 2
)
SELECT i.a_id, i.b_id,
       ROUND(i.inter / (1e0 * (za.sz + zb.sz - i.inter)), 6) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.a_id
JOIN sizes zb ON zb.doc_id = i.b_id
WHERE ROUND(i.inter / (1e0 * (za.sz + zb.sz - i.inter)), 6) >= 0.5
"""


@register("ngram_jaccard_pairs", _NGRAM_ORACLE)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-trigram Jaccard ≥ 0.5 with rare-n-gram inverted-index
    blocking (no all-pairs cross product)."""
    docs = datasets.load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5, max_df=20)


# ---------------------------------------------------------------------------
# A10: BFS depth (eccentricity of the source vertex)
# ---------------------------------------------------------------------------

from .operators.bfs import bfs  # noqa: E402
from .queries import _BFS_ORACLE  # noqa: E402

_BFS_DEPTH_ORACLE = _BFS_ORACLE.replace(
    "SELECT id, MIN(dist) AS dist FROM bfsr GROUP BY id",
    "SELECT MAX(dist) AS depth FROM "
    "(SELECT id, MIN(dist) AS dist FROM bfsr GROUP BY id)",
)


@register("bfs_depth", _BFS_DEPTH_ORACLE)
def q_bfs_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max BFS level from the min-id source — the reference prints
    this as the traversal depth (``tests/neo4j/.../App.java:210-215``,
    A10 in SURVEY §2.5)."""
    g = datasets.part_supplier_graph(spark, sf_dir).canonical()
    source = g.edges.agg(F.min("src").alias("s")).collect()[0]["s"]
    dist = bfs(g.edges, int(source), max_depth=32)
    g.unpersist()
    return dist.agg(F.max("dist").alias("depth"))


# ---------------------------------------------------------------------------
# A3 (global): graph-wide clustering coefficient
# ---------------------------------------------------------------------------

from .operators.triangles import clustering_coefficients  # noqa: E402
from .queries import _TRI_ORACLE  # noqa: E402

_GCC_ORACLE = _TRI_ORACLE.replace(
    """SELECT a.id, COALESCE(2 * t.n, 0) AS ntri
FROM (SELECT DISTINCT src AS id FROM user_edges) a""",
    """SELECT ROUND(SUM(COALESCE(2 * t.n, 0))
             / (1e0 * SUM(a.degree * (a.degree - 1))), 6) AS global_cc
FROM (SELECT src AS id, COUNT(*) AS degree FROM user_edges GROUP BY src) a""",
)


@register("global_clustering_coefficient", _GCC_ORACLE)
def q_global_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-wide clustering coefficient ``Σ ntri / Σ deg(deg-1)``
    (``streaming_clustering_coefficients.c:268-273``)."""
    g = datasets.user_graph(spark, sf_dir)
    cc = clustering_coefficients(g.edges)
    return cc.agg(
        F.round(
            F.sum("ntri")
            / (F.sum(F.col("degree") * (F.col("degree") - 1)) * F.lit(1.0)),
            6,
        ).alias("global_cc")
    )


# ---------------------------------------------------------------------------
# F1 / M4: typed edge scans over the typed user graph (etype column
# exercised end-to-end — reference stinger-defs.h:25 per-type edge
# lists; remove-all-of-type stinger.c:1065-1090)
# ---------------------------------------------------------------------------


@register(
    "typed_edges_scan",
    oracles.with_typed_edges(
        "SELECT src, dst, wgt, etype FROM typed_edges WHERE etype = 1"
    ),
)
def q_typed_edges_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 full edge scan restricted to one edge type
    (``Graph.edges_of_type`` — the ``FORALL_EDGES(S, type)`` analog);
    the filter prunes at the scan, no shuffle."""
    g = datasets.typed_user_graph(spark, sf_dir)
    return g.edges_of_type(1)


@register(
    "remove_edge_type_counts",
    oracles.with_typed_edges(
        """
SELECT etype, COUNT(*) AS n_edges, CAST(SUM(wgt) AS BIGINT) AS total_wgt
FROM typed_edges WHERE etype <> 0 GROUP BY etype
"""
    ),
)
def q_remove_edge_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 ``remove_all_edges_of_type(0)`` followed by a per-type
    aggregate over the surviving edges — proves the typed mutation
    path end-to-end (anti-filter + scan, both pushed down)."""
    g = datasets.typed_user_graph(spark, sf_dir).remove_edges_of_type(0)
    return g.edges.groupBy("etype").agg(
        F.count("*").alias("n_edges"),
        F.sum("wgt").cast("long").alias("total_wgt"),
    )


# ---------------------------------------------------------------------------
# edge-weight spectrum (log2-bucket histogram, the S9 sink shape on weights)
# ---------------------------------------------------------------------------

_WEIGHT_HIST_ORACLE = oracles.with_user_edges(
    body="""
SELECT CAST(FLOOR(LOG2(wgt)) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(wgt) AS BIGINT) AS total_weight
FROM (SELECT wgt FROM user_edges WHERE src < dst)
GROUP BY 1
""",
)


@register("edge_weight_histogram", _WEIGHT_HIST_ORACLE)
def q_edge_weight_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """log2-bucket histogram of canonical edge weights (multiplicity
    spectrum) — the S9 histogram sink applied to edge metadata; one
    map-side-combined aggregate."""
    g = datasets.user_graph(spark, sf_dir)
    canon = g.edges.filter(F.col("src") < F.col("dst"))
    return canon.groupBy(
        F.floor(F.log2("wgt")).cast("long").alias("bucket")
    ).agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum("wgt").cast("long").alias("total_weight"),
    )


# ---------------------------------------------------------------------------
# walk counting: number of length-1/2/3 walks from a fixed source
# (adjacency-power row — integer-exact Katz ingredients)
# ---------------------------------------------------------------------------

_WALKCOUNT_ORACLE = oracles.with_user_edges(
    body="""
SELECT target, n_len1, n_len2, n_len3 FROM (
  SELECT COALESCE(w1.dst, w2.dst, w3.dst) AS target,
         COALESCE(w1.n, 0) AS n_len1,
         COALESCE(w2.n, 0) AS n_len2,
         COALESCE(w3.n, 0) AS n_len3
  FROM w1
  FULL OUTER JOIN w2 ON w2.dst = w1.dst
  FULL OUTER JOIN w3 ON w3.dst = COALESCE(w1.dst, w2.dst)
)
""",
    extra_ctes="""
nbrs AS (SELECT DISTINCT src, dst FROM user_edges),
s AS (SELECT MIN(src) AS s FROM nbrs),
w1 AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS n FROM nbrs
       WHERE src = (SELECT s FROM s) GROUP BY dst),
w2 AS (SELECT e.dst, CAST(SUM(w1.n) AS BIGINT) AS n
       FROM w1 JOIN nbrs e ON e.src = w1.dst GROUP BY e.dst),
w3 AS (SELECT e.dst, CAST(SUM(w2.n) AS BIGINT) AS n
       FROM w2 JOIN nbrs e ON e.src = w2.dst GROUP BY e.dst)""",
)


@register("walk_counts_from_source", _WALKCOUNT_ORACLE)
def q_walk_counts_from_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Number of walks of length 1/2/3 from the smallest vertex to
    every target — one row of the adjacency powers A, A², A³ computed
    by two join-aggregate rounds on integer counts (the exact
    ingredients of Katz/exponential centralities)."""
    g = datasets.user_graph(spark, sf_dir)
    nbrs = g.edges.select("src", "dst").distinct().localCheckpoint()
    s = nbrs.agg(F.min("src")).collect()[0][0]
    w1 = (
        nbrs.filter(F.col("src") == s)
        .groupBy("dst")
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint()
    )
    def _next(w):
        return (
            w.withColumnRenamed("dst", "mid")
            .join(nbrs.withColumnRenamed("src", "mid"), "mid")
            .groupBy("dst")
            .agg(F.sum("n").cast("long").alias("n"))
            .localCheckpoint()
        )
    w2 = _next(w1)
    w3 = _next(w2)
    j = (
        w1.withColumnRenamed("n", "n_len1")
        .join(w2.withColumnRenamed("n", "n_len2"), "dst", "full_outer")
        .join(w3.withColumnRenamed("n", "n_len3"), "dst", "full_outer")
    )
    return j.select(
        F.col("dst").alias("target"),
        F.coalesce("n_len1", F.lit(0)).alias("n_len1"),
        F.coalesce("n_len2", F.lit(0)).alias("n_len2"),
        F.coalesce("n_len3", F.lit(0)).alias("n_len3"),
    )


# ---------------------------------------------------------------------------
# per-type triangle census (multiplex-layer analytics)
# ---------------------------------------------------------------------------

_TYPED_TRI_ORACLE = oracles.with_typed_edges(
    body="""
SELECT a.etype, CAST(COUNT(*) // 6 AS BIGINT) AS n_triangles
FROM te a
JOIN te b ON b.etype = a.etype AND b.src = a.dst AND b.dst <> a.src
JOIN te c ON c.etype = a.etype AND c.src = b.dst AND c.dst = a.src
GROUP BY a.etype
""",
    extra_ctes="te AS (SELECT DISTINCT etype, src, dst FROM typed_edges)",
)


@register("typed_triangle_census", _TYPED_TRI_ORACLE)
def q_typed_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles per edge-type layer of the typed user graph — the
    multiplex census (which interaction types close triads).  Engine
    side runs the degree-oriented enumeration with ``etype`` riding in
    every key (orientation, wedge, closing joins), so each layer pays
    Σ outdeg² within the layer only; the oracle is the independent
    6-fold symmetric triple join."""
    g = datasets.typed_user_graph(spark, sf_dir)
    nbrs = g.edges.select("etype", "src", "dst").distinct().localCheckpoint()
    canon = nbrs.filter(F.col("src") < F.col("dst"))
    deg = nbrs.groupBy("etype", F.col("src").alias("id")).agg(
        F.count("*").alias("deg")
    )
    with_keys = (
        canon.join(
            deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "sdeg"),
            ["etype", "src"],
        )
        .join(
            deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "ddeg"),
            ["etype", "dst"],
        )
    )
    fwd = F.struct(F.col("sdeg"), F.col("src")) < F.struct(F.col("ddeg"), F.col("dst"))
    oriented = with_keys.select(
        "etype",
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("a"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("b"),
        F.when(
            fwd, F.struct(F.col("ddeg").alias("kdeg"), F.col("dst").alias("kid"))
        )
        .otherwise(F.struct(F.col("sdeg").alias("kdeg"), F.col("src").alias("kid")))
        .alias("bkey"),
    ).localCheckpoint()
    w1 = oriented.select("etype", "a", F.col("b").alias("u"), F.col("bkey").alias("ukey"))
    w2 = oriented.select("etype", "a", F.col("b").alias("v"), F.col("bkey").alias("vkey"))
    wedges = w1.join(w2, ["etype", "a"]).filter(F.col("ukey") < F.col("vkey"))
    closing = oriented.select("etype", F.col("a").alias("u"), F.col("b").alias("v"))
    tri = wedges.join(closing, ["etype", "u", "v"])
    return tri.groupBy("etype").agg(F.count("*").cast("long").alias("n_triangles"))


# ---------------------------------------------------------------------------
# strongest edges with vertex names (attribute join over the physmap)
# ---------------------------------------------------------------------------

_STRONGEST_ORACLE = """
WITH directed AS (
  SELECT l_partkey AS pk, l_suppkey AS sk, CAST(COUNT(*) AS BIGINT) AS wgt
  FROM lineitem GROUP BY 1, 2
)
SELECT p.p_name AS part_name, s.s_name AS supplier_name, d.wgt FROM (
  SELECT pk, sk, wgt,
         ROW_NUMBER() OVER (ORDER BY wgt DESC, pk, sk) AS rnk
  FROM directed
) d JOIN part p ON p.p_partkey = d.pk
    JOIN supplier s ON s.s_suppkey = d.sk
WHERE d.rnk <= 20
"""


@register("strongest_edges_named", _STRONGEST_ORACLE)
def q_strongest_edges_named(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 heaviest part–supplier co-occurrence edges resolved back
    to names — the id→attribute join a user-facing result needs
    (M8 physmap direction: internal ids out, names in), deterministic
    (weight, pk, sk) tie-break.

    Scale shape: top-k via ``orderBy().limit(k)`` — Catalyst plans
    TakeOrderedAndProject (per-partition heaps + driver merge of k·p
    rows), never the single-task global sort a
    ``row_number().over(Window.orderBy(...))`` would force over the
    O(ne) pair table."""
    li = datasets.load_table(spark, sf_dir, "lineitem")
    part = datasets.load_table(spark, sf_dir, "part")
    supp = datasets.load_table(spark, sf_dir, "supplier")
    directed = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.count("*").cast("long").alias("wgt"))
    top = directed.orderBy(F.desc("wgt"), F.asc("pk"), F.asc("sk")).limit(20)
    return (
        top.join(part, top.pk == part.p_partkey)
        .join(supp, top.sk == supp.s_suppkey)
        .select(
            F.col("p_name").alias("part_name"),
            F.col("s_name").alias("supplier_name"),
            "wgt",
        )
    )


# ---------------------------------------------------------------------------
# bipartite projection with cosine weighting (item-item CF kernel)
# ---------------------------------------------------------------------------

_COPROJ_ORACLE = """
WITH bi AS (SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk FROM lineitem),
deg AS (SELECT sk, CAST(COUNT(*) AS BIGINT) AS deg FROM bi GROUP BY sk),
co AS (
  SELECT a.sk AS a_sk, b.sk AS b_sk, CAST(COUNT(*) AS BIGINT) AS common_parts
  FROM bi a JOIN bi b ON a.pk = b.pk AND a.sk < b.sk
  GROUP BY 1, 2
)
SELECT c.a_sk, c.b_sk, c.common_parts,
       ROUND(c.common_parts / SQRT(CAST(da.deg * db.deg AS DOUBLE)), 6)
         AS cosine
FROM co c JOIN deg da ON da.sk = c.a_sk JOIN deg db ON db.sk = c.b_sk
WHERE c.common_parts >= 3
"""


@register("supplier_cooccurrence", _COPROJ_ORACLE)
def q_supplier_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier–supplier similarity by shared parts: the bipartite
    projection with cosine weighting (``common / √(deg_a·deg_b)``) —
    the item-item collaborative-filtering kernel.  Wedge join keyed on
    the part (bounded by part degree, AQE-splittable); pairs below 3
    common parts pruned before the output."""
    li = datasets.load_table(spark, sf_dir, "lineitem")
    bi = li.select(
        F.col("l_suppkey").alias("sk"), F.col("l_partkey").alias("pk")
    ).distinct().localCheckpoint()
    deg = bi.groupBy("sk").agg(F.count("*").cast("long").alias("deg"))
    a = bi.select(F.col("sk").alias("a_sk"), "pk")
    b = bi.select(F.col("sk").alias("b_sk"), "pk")
    co = (
        a.join(b, "pk")
        .filter(F.col("a_sk") < F.col("b_sk"))
        .groupBy("a_sk", "b_sk")
        .agg(F.count("*").cast("long").alias("common_parts"))
        .filter(F.col("common_parts") >= 3)
    )
    return (
        co.join(deg.withColumnRenamed("sk", "a_sk").withColumnRenamed("deg", "da"), "a_sk")
        .join(deg.withColumnRenamed("sk", "b_sk").withColumnRenamed("deg", "db"), "b_sk")
        .select(
            "a_sk",
            "b_sk",
            "common_parts",
            F.round(
                F.col("common_parts")
                / F.sqrt((F.col("da") * F.col("db")).cast("double")),
                6,
            ).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# edge lifetime stats (M6 time metadata: time_recent - time_first)
# ---------------------------------------------------------------------------

_LIFETIME_ORACLE = (
    _TIMED_ORACLE.split("thr AS")[0]
    + """
lived AS (
  SELECT src, dst, time_recent - time_first AS lifetime_us
  FROM folded WHERE wgt IS NOT NULL AND wgt > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(CASE WHEN lifetime_us = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_single_touch,
       CAST(MIN(lifetime_us) AS BIGINT) AS min_life_us,
       CAST(MAX(lifetime_us) AS BIGINT) AS max_life_us,
       CAST(SUM(lifetime_us) AS BIGINT) AS total_life_us
FROM lived
"""
)


@register("edge_lifetime_stats", _LIFETIME_ORACLE)
def q_edge_lifetime_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifetime (``time_recent - time_first``) summary of the replayed
    timestamped edge table — how long edges stay active, the M6
    metadata viewed as churn statistics; integer micros throughout."""
    acts = datasets.actions_stream(spark, sf_dir)
    edges = upd.apply_actions_timed(None, acts)
    life = edges.filter(F.col("wgt") > 0).select(
        (F.col("time_recent") - F.col("time_first")).alias("lifetime_us")
    )
    return life.agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum(F.when(F.col("lifetime_us") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_single_touch"),
        F.min("lifetime_us").cast("long").alias("min_life_us"),
        F.max("lifetime_us").cast("long").alias("max_life_us"),
        F.sum("lifetime_us").cast("long").alias("total_life_us"),
    )


# ---------------------------------------------------------------------------
# adjacency delta-gap compression stats (WebGraph-style storage model)
# ---------------------------------------------------------------------------

_GAP_ORACLE = oracles.with_edges(
    """
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(LENGTH(bin(gap))) AS BIGINT) AS total_gap_bits,
       CAST(64 * COUNT(*) AS BIGINT) AS raw_bits,
       CAST((1000 * SUM(LENGTH(bin(gap)))) // (64 * COUNT(*)) AS BIGINT)
         AS ratio_milli
FROM (
  SELECT CASE WHEN lag IS NULL THEN dst + 1 ELSE dst - lag END AS gap
  FROM (
    SELECT src, dst, LAG(dst) OVER (PARTITION BY src ORDER BY dst) AS lag
    FROM edges
  )
)
""",
)


@register("adjacency_gap_stats", _GAP_ORACLE)
def q_adjacency_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-gap encoding cost of the sorted adjacency lists
    (Boldi/Vigna WebGraph model): per vertex, neighbors are stored as
    first-id+1 then successive gaps; the bit cost of a gap is
    ``len(bin(gap))``.  Reports total gap bits vs 64-bit raw and the
    milli compression ratio — the storage-design companion to the CSR
    export (S13).  One per-src window + one aggregation; ``bin()``
    exists verbatim on both engines so the bit math is portable."""
    g = datasets.part_supplier_graph(spark, sf_dir)
    w = Window.partitionBy("src").orderBy("dst")
    gaps = g.edges.select(
        "src", "dst", F.lag("dst").over(w).alias("lg")
    ).select(
        F.when(F.col("lg").isNull(), F.col("dst") + 1)
        .otherwise(F.col("dst") - F.col("lg"))
        .alias("gap")
    )
    return gaps.agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum(F.length(F.bin("gap"))).cast("long").alias("total_gap_bits"),
        (F.lit(64) * F.count("*")).cast("long").alias("raw_bits"),
    ).select(
        "n_edges",
        "total_gap_bits",
        "raw_bits",
        F.expr("(1000 * total_gap_bits) div raw_bits").cast("long").alias("ratio_milli"),
    )


# ---------------------------------------------------------------------------
# blocked fuzzy join: customer names within edit distance 1
# ---------------------------------------------------------------------------

def _deletion_keys(named: DataFrame) -> DataFrame:
    """``(k, name, blk)``: the name plus each single-character
    deletion — the lev≤1 complete blocking key set."""
    return named.select(
        "k",
        "name",
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(0, length(name)),"
                " i -> IF(i = 0, name,"
                " concat(substring(name, 1, i - 1),"
                " substring(name, i + 1, length(name))))))"
            )
        ).alias("blk"),
    )


# SymSpell-style deletion-neighborhood blocking: every name emits
# itself plus each single-character deletion as a block key; two names
# within Levenshtein 1 (sub/ins/del) provably share a key, and block
# sizes stay O(alphabet) even on dense sequential ids — the 13-char
# prefix blocking this replaces collapsed to ONE giant block on
# zero-padded names (quadratic at sf0.1; caught by the scale profile).
_FUZZY_KEYS_SQL = """
  SELECT k, name,
         CASE WHEN t.i = 0 THEN name
              ELSE substr(name, 1, t.i - 1) || substr(name, t.i + 1) END AS blk
  FROM blocked, UNNEST(generate_series(0, len(name))) t(i)
"""

_FUZZY_ORACLE = f"""
WITH blocked AS (
  SELECT c_custkey AS k, c_name AS name FROM customer
),
fkeys AS MATERIALIZED (
  SELECT DISTINCT k, name, blk FROM ({_FUZZY_KEYS_SQL})
),
fcand AS (
  SELECT DISTINCT a.k AS a_key, a.name AS a_name, b.k AS b_key, b.name AS b_name
  FROM fkeys a JOIN fkeys b ON a.blk = b.blk AND a.k < b.k
)
SELECT a_key, b_key,
       CAST(levenshtein(a_name, b_name) AS BIGINT) AS dist
FROM fcand
WHERE levenshtein(a_name, b_name) <= 1
"""


@register("fuzzy_name_pairs", _FUZZY_ORACLE)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join with 100%-recall deletion-neighborhood
    blocking (the SymSpell scheme): each name keys on itself and every
    single-character deletion, so any pair within Levenshtein 1 shares
    a block, while block sizes stay O(alphabet) even on dense
    zero-padded ids (the prefix blocking this replaces degenerated to
    one global block and a quadratic verify at sf0.1).
    ``levenshtein`` is the same unit-cost DP on both engines, so
    distances are exact integers."""
    cust = datasets.load_table(spark, sf_dir, "customer")
    keys = _deletion_keys(
        cust.select(F.col("c_custkey").alias("k"), F.col("c_name").alias("name"))
    )
    a = keys.alias("a")
    b = keys.alias("b")
    cand = (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.k") < F.col("b.k")))
        .select(
            F.col("a.k").alias("a_key"),
            F.col("a.name").alias("a_name"),
            F.col("b.k").alias("b_key"),
            F.col("b.name").alias("b_name"),
        )
        .distinct()
    )
    return (
        cand.select(
            "a_key",
            "b_key",
            F.levenshtein(F.col("a_name"), F.col("b_name")).cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= 1)
    )


# ---------------------------------------------------------------------------
# weakest ties: lowest-embeddedness edges (local-bridge spectrum)
# ---------------------------------------------------------------------------

_WEAK_TIES_ORACLE = oracles.with_user_edges(
    """
SELECT src, dst, sup, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT e.src, e.dst, CAST(COALESCE(t.sup, 0) AS BIGINT) AS sup,
         ROW_NUMBER() OVER (ORDER BY COALESCE(t.sup, 0), e.src, e.dst) AS rnk
  FROM (SELECT DISTINCT src, dst FROM user_edges WHERE src < dst) e
  LEFT JOIN (
    SELECT a.src AS s, b.src AS d, COUNT(*) AS sup
    FROM (SELECT DISTINCT src, dst FROM user_edges) a
    JOIN (SELECT DISTINCT src, dst FROM user_edges) b
      ON a.dst = b.dst AND a.src < b.src
    GROUP BY 1, 2) t
  ON t.s = e.src AND t.d = e.dst)
WHERE rnk <= 20
""",
)


@register("weakest_ties", _WEAK_TIES_ORACLE)
def q_weakest_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granovetter weak-tie spectrum: the 20 lowest-embeddedness
    canonical edges (triangle support, zero = a true local bridge
    whose removal stretches its endpoints to distance >= 3) — the
    community-boundary signal, composed from the shared edge-support
    kernel plus a top-k.

    Scale shape: ``orderBy().limit(20)`` → TakeOrderedAndProject over
    the O(ne) support table (no single-task global sort); the rank
    window then runs over exactly 20 rows."""
    from pyspark.sql import Window

    from .operators.triangles import edge_triangle_support

    g = datasets.user_graph(spark, sf_dir)
    nbrs = g.edges.select("src", "dst").distinct().localCheckpoint()
    canon = nbrs.filter(F.col("src") < F.col("dst"))
    sup = edge_triangle_support(canon).select(
        "src", "dst", F.col("sup").cast("long").alias("sup")
    )
    top = sup.orderBy("sup", "src", "dst").limit(20)
    w = Window.orderBy("sup", "src", "dst")  # over 20 rows only
    return top.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    ).select("src", "dst", "sup", "rnk")


# ---------------------------------------------------------------------------
# typed degree profile: per-vertex degree vector across edge types
# ---------------------------------------------------------------------------

_TYPED_PROFILE_ORACLE = oracles.with_typed_edges(
    """
SELECT src AS id, etype, CAST(COUNT(*) AS BIGINT) AS deg,
       CAST(SUM(wgt) AS BIGINT) AS wdeg
FROM typed_edges GROUP BY src, etype
"""
)


@register("typed_degree_profile", _TYPED_PROFILE_ORACLE)
def q_typed_degree_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex degree and weighted degree BY EDGE TYPE over the
    typed multiplex graph — the reference's per-type adjacency view
    (``stinger-defs.h:25``) as one grouped aggregation; the layer
    profile feeds multiplex analytics (type entropy, layer
    correlation)."""
    g = datasets.typed_user_graph(spark, sf_dir)
    return g.edges.groupBy(F.col("src").alias("id"), "etype").agg(
        F.count("*").cast("long").alias("deg"),
        F.sum("wgt").cast("long").alias("wdeg"),
    )


# ---------------------------------------------------------------------------
# Entity resolution closure: fuzzy pairs -> connected components ->
# canonical entity ids (block/verify/cluster, end to end)
# ---------------------------------------------------------------------------

#: closure via the bounded min-label + pointer-jump CTE chain
#: (``oracles.cc_bounded_ctes``) rather than the exact-but-quadratic
#: ``WITH RECURSIVE`` transitive closure: the all-pairs ``eclo`` row
#: space is O(Σ|component|²), which blows past 1800s at sf0.1
#: (262k match edges) while the bounded chain is O(rounds·|E|) —
#: same fixpoint, convergence asserted by the poison row.
_ENTITY_ORACLE = f"""
WITH blocked AS (
  SELECT c_custkey AS k, c_name AS name FROM customer
),
ekeys AS MATERIALIZED (
  SELECT DISTINCT k, name, blk FROM ({_FUZZY_KEYS_SQL})
),
epairs AS MATERIALIZED (
  SELECT a_key, b_key FROM (
    SELECT DISTINCT a.k AS a_key, a.name AS a_name, b.k AS b_key, b.name AS b_name
    FROM ekeys a JOIN ekeys b ON a.blk = b.blk AND a.k < b.k)
  WHERE levenshtein(a_name, b_name) <= 1
),
esym AS MATERIALIZED (
  SELECT a_key AS src, b_key AS dst FROM epairs
  UNION ALL
  SELECT b_key, a_key FROM epairs
),
{oracles.cc_bounded_ctes("esym", rounds=8, out="elbl")}
SELECT CAST(l.id AS BIGINT) AS c_custkey,
       CAST(l.label AS BIGINT) AS canonical,
       CAST(g.n AS BIGINT) AS group_size
FROM elbl l
JOIN (SELECT label, COUNT(*) AS n FROM elbl GROUP BY label) g USING (label)
"""


@register("entity_groups", _ENTITY_ORACLE)
def q_entity_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end to end: the blocked Levenshtein≤1 pairs
    of ``fuzzy_name_pairs`` become an undirected match graph whose
    connected components are entity clusters; every matched customer
    reports its canonical id (the component's min key — exactly the
    min-label CC contract) and cluster size.

    Scale shape: deletion-neighborhood blocking (see
    ``fuzzy_name_pairs``) keeps candidate generation linear, the
    closure is the same pointer-jumping CC kernel as
    ``connected_components`` (no transitive-closure blowup on Spark —
    the recursive closure lives only in the small DuckDB twin), and
    the size rollup is one group-by on the component label."""
    from .operators.components import connected_components

    cust = datasets.load_table(spark, sf_dir, "customer")
    keys = _deletion_keys(
        cust.select(F.col("c_custkey").alias("k"), F.col("c_name").alias("name"))
    )
    a = keys.alias("a")
    b = keys.alias("b")
    pairs = (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.k") < F.col("b.k")))
        .select(
            F.col("a.k").alias("src"),
            F.col("a.name").alias("an"),
            F.col("b.k").alias("dst"),
            F.col("b.name").alias("bn"),
        )
        .distinct()
        .filter(F.levenshtein(F.col("an"), F.col("bn")) <= 1)
        .select("src", "dst")
        .localCheckpoint()
    )
    sym = pairs.unionAll(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    cc = connected_components(sym)
    sizes = cc.groupBy("label").agg(F.count("*").alias("group_size"))
    return cc.join(F.broadcast(sizes), "label").select(
        F.col("id").cast("long").alias("c_custkey"),
        F.col("label").cast("long").alias("canonical"),
        F.col("group_size").cast("long").alias("group_size"),
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprint overlap pairs (inverted-index near-dup join)
# ---------------------------------------------------------------------------

_FP_OVERLAP_ORACLE = """
WITH fsh AS (
  SELECT DISTINCT doc_id, substr(text, i, 8) AS sh
  FROM documents, UNNEST(generate_series(1, len(text) - 7)) AS t(i)
  WHERE len(text) >= 8
),
fh AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM fsh
),
ftop AS (
  SELECT doc_id, h FROM (
    SELECT doc_id, h, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h) AS rn
    FROM fh)
  WHERE rn <= 4
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS shared
FROM ftop a JOIN ftop b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""


@register("fingerprint_overlap_pairs", _FP_OVERLAP_ORACLE)
def q_fingerprint_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing ≥2 of their 4 winnowing fingerprint
    hashes (Schleimer et al., SIGMOD'03) — the pairing step on top of
    ``doc_fingerprints``: an inverted-index equi-join on the hash, so
    candidates only form inside shared buckets, never all-pairs."""
    docs = datasets.load_table(spark, sf_dir, "documents")
    return textstats.fingerprint_overlap_pairs(docs, k=8, keep=4, min_shared=2)


# ---------------------------------------------------------------------------
# Vertex types (vtype): the reference's per-vertex type slot and
# type-filtered ("active vtypes only") algorithms
# ---------------------------------------------------------------------------

_VTYPE_COUNTS_ORACLE = oracles.with_typed_vertices(
    """
SELECT v.vtype,
       CAST(COUNT(*) AS BIGINT) AS n_vertices,
       CAST(COALESCE(SUM(d.deg), 0) AS BIGINT) AS total_degree
FROM vertices v LEFT JOIN (
  SELECT src AS id, COUNT(*) AS deg
  FROM (SELECT DISTINCT src, dst FROM user_edges) GROUP BY src
) d ON d.id = v.id
GROUP BY v.vtype
"""
)


@register("typed_vertex_counts", _VTYPE_COUNTS_ORACLE)
def q_typed_vertex_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertex census by VERTEX type: population and total (simple)
    degree per vtype — the per-type vertex view of the reference's
    typed vertex array (``tests/stinger/include/stinger.h:143-149``,
    ``stinger_vtype_get``).  One groupBy over the vertex dim with a
    left-joined degree aggregate; every stage is key-partitioned."""
    verts = datasets.typed_vertices(spark, sf_dir)
    g = datasets.user_graph(spark, sf_dir)
    deg = (
        g.edges.select("src", "dst")
        .distinct()
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("deg"))
    )
    return (
        verts.join(deg, "id", "left")
        .groupBy("vtype")
        .agg(
            F.count("*").cast("long").alias("n_vertices"),
            F.coalesce(F.sum("deg"), F.lit(0)).cast("long").alias("total_degree"),
        )
    )


_VTYPE_CC_ORACLE = oracles.with_typed_vertices(
    """
SELECT CAST((SELECT COUNT(*) FROM active) AS BIGINT) AS n_active,
       CAST((SELECT COUNT(DISTINCT label) FROM lab)
            + (SELECT COUNT(*) FROM active a
               WHERE NOT EXISTS (SELECT 1 FROM lab l WHERE l.id = a.id))
         AS BIGINT) AS n_components
""",
    extra_ctes="""
active AS (SELECT id FROM vertices WHERE vtype = 0),
aedges AS (
  SELECT DISTINCT e.src, e.dst FROM user_edges e
  JOIN active a ON e.src = a.id JOIN active b ON e.dst = b.id
),
reach(id, label) AS (
  SELECT src, src FROM aedges
  UNION
  SELECT e.dst, r.label FROM aedges e JOIN reach r ON e.src = r.id
),
lab AS (SELECT id, MIN(label) AS label FROM reach GROUP BY id)
""",
).replace("WITH ", "WITH RECURSIVE ", 1)


@register("typed_active_components", _VTYPE_CC_ORACLE)
def q_typed_active_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 with the reference's vtype filter: component count over the
    subgraph induced on ACTIVE-vtype vertices only (vtype 0), plus
    singleton components for active vertices with no active-active
    edge — the exact "active vtypes only" semantics of
    ``tests/stinger/src/alg/static_components.c:106-264``.

    Scale shape: two semi-joins restrict the edge table (one scan),
    the CC kernel runs only on the induced subgraph, and the three
    scalar aggregates ride broadcast 1-row cross joins."""
    from .operators.components import connected_components

    verts = datasets.typed_vertices(spark, sf_dir)
    active = verts.filter(F.col("vtype") == 0).select("id").localCheckpoint()
    g = datasets.user_graph(spark, sf_dir)
    nbrs = g.edges.select("src", "dst").distinct()
    sub = (
        nbrs.join(active.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(active.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .select("src", "dst")
        .localCheckpoint()
    )
    labels = connected_components(sub).localCheckpoint()
    na = active.agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    nc = labels.agg(F.countDistinct("label").alias("n_cc"))
    ns = active.join(labels, "id", "left_anti").agg(
        F.count(F.lit(1)).alias("n_singles")
    )
    return (
        na.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(ns))
        .select(
            "n_active",
            (F.col("n_cc") + F.col("n_singles")).cast("long").alias("n_components"),
        )
    )


_VTYPE_MIX_ORACLE = oracles.with_typed_vertices(
    """
SELECT vs.vtype AS src_vtype, vd.vtype AS dst_vtype,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(e.wgt) AS BIGINT) AS total_wgt
FROM user_edges e
JOIN vertices vs ON e.src = vs.id
JOIN vertices vd ON e.dst = vd.id
GROUP BY 1, 2
"""
)


@register("vtype_mixing_matrix", _VTYPE_MIX_ORACLE)
def q_vtype_mixing_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge mixing matrix across VERTEX types: edge count and total
    weight per (src vtype, dst vtype) — the typed-endpoint scan the
    reference exposes through per-vertex type checks inside edge
    traversals (``stinger_vtype_get`` guards in
    ``static_components.c:106-264``), and the homophily summary of
    multiplex analysis.  Two dimension joins (vertex dim is tiny
    relative to edges — Catalyst/AQE broadcasts it at test scale;
    at 100 TB it shuffles on the join key) + one grouped aggregate."""
    verts = datasets.typed_vertices(spark, sf_dir)
    g = datasets.user_graph(spark, sf_dir)
    vs = verts.select(F.col("id").alias("src"), F.col("vtype").alias("src_vtype"))
    vd = verts.select(F.col("id").alias("dst"), F.col("vtype").alias("dst_vtype"))
    return (
        g.edges.join(vs, "src")
        .join(vd, "dst")
        .groupBy("src_vtype", "dst_vtype")
        .agg(
            F.count("*").cast("long").alias("n_edges"),
            F.sum("wgt").cast("long").alias("total_wgt"),
        )
    )


_VTYPE_BFS_ORACLE = oracles.with_typed_vertices(
    """
SELECT id, CAST(MIN(dist) AS BIGINT) AS dist FROM bfsr GROUP BY id
""",
    extra_ctes="""
active AS (SELECT id FROM vertices WHERE vtype = 0),
aedges AS (
  SELECT DISTINCT e.src, e.dst FROM user_edges e
  JOIN active a ON e.src = a.id JOIN active b ON e.dst = b.id
),
bfsr(id, dist) AS (
  SELECT src, 0 FROM (SELECT MIN(src) AS src FROM aedges)
  WHERE src IS NOT NULL
  UNION
  SELECT e.dst, r.dist + 1 FROM aedges e JOIN bfsr r ON e.src = r.id
  WHERE r.dist < 32
)
""",
).replace("WITH ", "WITH RECURSIVE ", 1)


@register("typed_bfs_distances", _VTYPE_BFS_ORACLE)
def q_typed_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distances over the ACTIVE-vtype induced subgraph from
    its minimum vertex id — the reference's typed traversal guard
    (``stinger_vtype_get`` checks inside edge loops,
    ``static_components.c:106-264``) applied to the F2/§2.4 BFS
    kernel: restrict once via two semi-joins (one edge scan), then
    run the untyped level-synchronous frontier on the subgraph."""
    from .operators.bfs import bfs

    verts = datasets.typed_vertices(spark, sf_dir)
    active = verts.filter(F.col("vtype") == 0).select("id").localCheckpoint()
    g = datasets.user_graph(spark, sf_dir)
    nbrs = g.edges.select("src", "dst").distinct()
    sub = (
        nbrs.join(active.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(active.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .select("src", "dst")
        .localCheckpoint()
    )
    src_row = sub.agg(F.min("src").alias("s")).collect()[0]["s"]
    if src_row is None:
        # no active-active edge anywhere: both engines return empty
        # (the oracle's seed row is NULL-guarded the same way)
        return spark.createDataFrame([], "id long, dist long")
    return bfs(sub, int(src_row), max_depth=32).select(
        "id", F.col("dist").cast("long").alias("dist")
    )
