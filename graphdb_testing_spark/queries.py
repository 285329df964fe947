"""Registered queries + DuckDB oracle SQL — the driver contract body.

Each entry pairs a PySpark implementation (``(spark, sf_dir) ->
DataFrame``) with an equivalent ANSI-SQL string DuckDB runs over the
same parquet tables.  Column names and value semantics are engineered
to hash-match bit-for-bit:

* integer results are exact by construction;
* money sums go through ``DECIMAL(18,x)`` (exact, order-independent)
  and back to DOUBLE;
* iterative doubles (PageRank) are rounded to 6 decimals on both
  sides;
* fixpoint kernels (CC, BFS) have order-independent unique solutions;
  bounded-round kernels (k-core, PageRank) run the *same* round count
  on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import datasets, oracles
from .operators import updates as upd
from .operators.bfs import bfs
from .operators.components import connected_components
from .operators.kcore import kcore_vertices
from .operators.pagerank import pagerank
from .operators.triangles import clustering_coefficients, triangles_per_vertex

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(_ORACLES)


# ---------------------------------------------------------------------------
# degrees / scans (M7, A8)
# ---------------------------------------------------------------------------


@register(
    "vertex_degrees",
    oracles.with_edges(
        "SELECT src AS id, COUNT(*) AS degree FROM edges GROUP BY src"
    ),
)
def q_vertex_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex degree on the part–supplier graph (reference
    ``tests/sqlite/test.c:260``)."""
    g = datasets.part_supplier_graph(spark, sf_dir)
    return g.out_degrees()


@register(
    "degree_distribution",
    oracles.with_edges(
        """
SELECT degree, COUNT(*) AS n_vertices
FROM (SELECT src, COUNT(*) AS degree FROM edges GROUP BY src)
GROUP BY degree
"""
    ),
)
def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram (reference histogram sink,
    ``src/util/histogram.c:6-145``)."""
    g = datasets.part_supplier_graph(spark, sf_dir)
    return g.out_degrees().groupBy("degree").agg(F.count("*").alias("n_vertices"))


# ---------------------------------------------------------------------------
# connected components (kernel 2)
# ---------------------------------------------------------------------------

# bounded-round label propagation with pointer jumping + convergence
# poison guard (oracles.cc_bounded_ctes) — the old transitive-closure
# ``reach`` CTE was exact but O(|V|·|E|), timing out past sf0.01
_CC_ORACLE = oracles.with_edges(
    body="SELECT id, label FROM lab",
    extra_ctes=oracles.cc_bounded_ctes("edges"),
)


@register("connected_components", _CC_ORACLE)
def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CC labels; label = min vertex id of the component (the unique
    fixpoint of the reference's min-label propagation,
    ``static_components.c:6-54``)."""
    g = datasets.part_supplier_graph(spark, sf_dir).canonical()
    labels = connected_components(g.edges)
    g.unpersist()
    return labels


@register(
    "component_count",
    _CC_ORACLE.replace(
        "SELECT id, label FROM lab",
        "SELECT COUNT(DISTINCT label) AS n_components FROM lab",
    ),
)
def q_component_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component count (``tests/sqlite/test.c:180``,
    ``test_python.py:105``)."""
    g = datasets.part_supplier_graph(spark, sf_dir).canonical()
    labels = connected_components(g.edges)
    g.unpersist()
    return labels.agg(F.countDistinct("label").alias("n_components"))


# ---------------------------------------------------------------------------
# BFS (kernel 3)
# ---------------------------------------------------------------------------

_BFS_ORACLE = oracles.with_edges(
    body="SELECT id, MIN(dist) AS dist FROM bfsr GROUP BY id",
    extra_ctes="""
bfsr(id, dist) AS (
  SELECT (SELECT MIN(src) FROM edges), 0
  UNION
  SELECT e.dst, b.dist + 1 FROM edges e JOIN bfsr b ON e.src = b.id
  WHERE b.dist < 32
)
""",
).replace("WITH ", "WITH RECURSIVE ", 1)


@register("bfs_distances", _BFS_ORACLE)
def q_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance from the minimum vertex id (the reference uses
    source 0, ``tests/stinger/main.c:141``; min id generalizes to
    graphs whose ids don't start at 0)."""
    g = datasets.part_supplier_graph(spark, sf_dir).canonical()
    source = g.edges.agg(F.min("src").alias("s")).collect()[0]["s"]
    dist = bfs(g.edges, int(source), max_depth=32)
    g.unpersist()
    return dist


@register(
    "bfs_frontier_sizes",
    _BFS_ORACLE.replace(
        "SELECT id, MIN(dist) AS dist FROM bfsr GROUP BY id",
        "SELECT dist, COUNT(*) AS frontier FROM "
        "(SELECT id, MIN(dist) AS dist FROM bfsr GROUP BY id) GROUP BY dist",
    ),
)
def q_bfs_frontier_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertices reached per BFS level — the per-level frontier sizes
    the reference prints as its BFS invariant
    (``tests/sqlite/test.c:226-227``)."""
    g = datasets.part_supplier_graph(spark, sf_dir).canonical()
    source = g.edges.agg(F.min("src").alias("s")).collect()[0]["s"]
    dist = bfs(g.edges, int(source), max_depth=32)
    g.unpersist()
    return dist.groupBy("dist").agg(F.count("*").alias("frontier"))


# ---------------------------------------------------------------------------
# PageRank (kernel 4) — fixed 5 iterations, unrolled in SQL
# ---------------------------------------------------------------------------


def _pagerank_oracle(iters: int = 5) -> str:
    ctes = [
        "deg AS (SELECT src AS id, COUNT(*) AS degree FROM edges GROUP BY src)",
        "nv AS (SELECT COUNT(*) AS n FROM deg)",
        "pr0 AS (SELECT id, degree, 1e0 / (SELECT n FROM nv) AS pr FROM deg)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""pr{i} AS (
  SELECT d.id, d.degree,
         0.15e0 / (SELECT n FROM nv) + 0.85e0 * COALESCE(m.mass, 0e0) AS pr
  FROM deg d LEFT JOIN (
    SELECT e.src AS id, SUM(p.pr / p.degree) AS mass
    FROM edges e JOIN pr{i - 1} p ON e.dst = p.id GROUP BY e.src
  ) m ON d.id = m.id)"""
        )
    return oracles.with_edges(
        body=f"SELECT id, ROUND(pr, 6) AS pr FROM pr{iters}",
        extra_ctes=",\n".join(ctes),
    )


@register("pagerank_5iter", _pagerank_oracle(5))
def q_pagerank_5iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 5 PageRank rounds (d=0.85, init 1/nv — the reference's
    parameters, ``static_pagerank.c:286-328``), values rounded to 6
    decimals for float-stable oracle comparison.  Full-convergence
    PageRank (eps=1e-8, maxiter=100) is benchmarked in bench.py."""
    g = datasets.part_supplier_graph(spark, sf_dir).canonical()
    pr = pagerank(g.edges, num_iter=5)
    g.unpersist()
    return pr.select("id", F.round("pr", 6).alias("pr"))


def _ppr_oracle(iters: int = 5, n_seeds: int = 3) -> str:
    ctes = [
        f"srcs AS (SELECT src AS id FROM edges GROUP BY src"
        f" ORDER BY src LIMIT {n_seeds})",
        "deg AS (SELECT src AS id, COUNT(*) AS degree FROM edges GROUP BY src)",
        f"""pr0 AS (
  SELECT d.id, d.degree,
         CASE WHEN s.id IS NOT NULL THEN 1e0 / {n_seeds} ELSE 0e0 END AS pr
  FROM deg d LEFT JOIN srcs s ON d.id = s.id)""",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""pr{i} AS (
  SELECT d.id, d.degree,
         CASE WHEN s.id IS NOT NULL THEN 0.15e0 / {n_seeds} ELSE 0e0 END
           + 0.85e0 * COALESCE(m.mass, 0e0) AS pr
  FROM deg d
  LEFT JOIN srcs s ON d.id = s.id
  LEFT JOIN (
    SELECT e.src AS id, SUM(p.pr / p.degree) AS mass
    FROM edges e JOIN pr{i - 1} p ON e.dst = p.id GROUP BY e.src
  ) m ON d.id = m.id)"""
        )
    return oracles.with_edges(
        body=f"SELECT id, ROUND(pr, 6) AS pr FROM pr{iters}",
        extra_ctes=",\n".join(ctes),
    )


@register("personalized_pagerank", _ppr_oracle(5))
def q_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from the 3 smallest vertex ids (seed set
    shared deterministically with the SQL oracle), 5 rounds — ranking
    relative to a seed set, the random-walk-with-restart primitive."""
    from .operators.pagerank import personalized_pagerank

    g = datasets.part_supplier_graph(spark, sf_dir).canonical()
    seeds = [
        r.id
        for r in g.edges.select(F.col("src").alias("id"))
        .distinct()
        .orderBy("id")
        .limit(3)
        .collect()
    ]
    pr = personalized_pagerank(g.edges, seeds, num_iter=5)
    g.unpersist()
    return pr.select("id", F.round("pr", 6).alias("pr"))


# ---------------------------------------------------------------------------
# triangles / clustering coefficients (A2, A3) — user graph
# ---------------------------------------------------------------------------

_TRI_ORACLE = oracles.with_user_edges(
    body="""
SELECT a.id, COALESCE(2 * t.n, 0) AS ntri
FROM (SELECT DISTINCT src AS id FROM user_edges) a
LEFT JOIN (
  SELECT id, COUNT(*) AS n FROM (
    SELECT e1.src AS id FROM canon e1 JOIN canon e2 ON e1.dst = e2.src
                        JOIN canon e3 ON e1.src = e3.src AND e2.dst = e3.dst
    UNION ALL
    SELECT e1.dst FROM canon e1 JOIN canon e2 ON e1.dst = e2.src
                  JOIN canon e3 ON e1.src = e3.src AND e2.dst = e3.dst
    UNION ALL
    SELECT e2.dst FROM canon e1 JOIN canon e2 ON e1.dst = e2.src
                  JOIN canon e3 ON e1.src = e3.src AND e2.dst = e3.dst
  ) GROUP BY id
) t ON a.id = t.id
""",
    extra_ctes="canon AS (SELECT DISTINCT src, dst FROM user_edges WHERE src < dst)",
)


@register("triangle_counts", _TRI_ORACLE)
def q_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle counts, reference 2×-per-triangle
    convention (``streaming_clustering_coefficients.c:14-70``)."""
    g = datasets.user_graph(spark, sf_dir)
    return triangles_per_vertex(g.edges)


@register(
    "clustering_coefficients",
    _TRI_ORACLE.replace(
        """SELECT a.id, COALESCE(2 * t.n, 0) AS ntri
FROM (SELECT DISTINCT src AS id FROM user_edges) a""",
        """SELECT a.id, COALESCE(2 * t.n, 0) AS ntri, a.degree,
       CASE WHEN a.degree >= 2
            THEN ROUND(COALESCE(2 * t.n, 0) / (1e0 * a.degree * (a.degree - 1)), 6)
            ELSE 0e0 END AS local_cc
FROM (SELECT src AS id, COUNT(*) AS degree FROM user_edges GROUP BY src) a""",
    ),
)
def q_clustering_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficients
    (``streaming_clustering_coefficients.c:268-273``)."""
    g = datasets.user_graph(spark, sf_dir)
    cc = clustering_coefficients(g.edges)
    return cc.select("id", "ntri", "degree", F.round("local_cc", 6).alias("local_cc"))


# ---------------------------------------------------------------------------
# k-core (A1) — fixed 8 peel rounds, unrolled in SQL
# ---------------------------------------------------------------------------


def _kcore_oracle(k: int, rounds: int) -> str:
    # ue AS MATERIALIZED: without it DuckDB re-inlines the user_edges
    # events-self-join into every peel round's two joins (16 rebuilds
    # at rounds=8) — the whole reason this oracle used to blow the
    # sf0.1 watchdog despite being round-bounded
    ctes = [
        "ue AS MATERIALIZED (SELECT src, dst FROM user_edges)",
        "s0 AS (SELECT DISTINCT src AS id FROM ue)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""s{i} AS MATERIALIZED (
  SELECT e.src AS id FROM ue e
  JOIN s{i - 1} a ON e.src = a.id
  JOIN s{i - 1} b ON e.dst = b.id
  GROUP BY e.src HAVING COUNT(*) >= {k})"""
        )
    return oracles.with_user_edges(
        body=f"SELECT id FROM s{rounds}", extra_ctes=",\n".join(ctes)
    )


@register("kcore_k3", _kcore_oracle(3, 8))
def q_kcore_k3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core membership after exactly 8 peel rounds (deterministic
    round count on both sides; converges well before 8 on the test
    graphs).  Reference ``static_kcore.c:12-57``."""
    g = datasets.user_graph(spark, sf_dir)
    return kcore_vertices(g.edges, 3, max_rounds=8)


# ---------------------------------------------------------------------------
# update stream merge (M1-M5, M13)
# ---------------------------------------------------------------------------

_APPLY_ACTIONS_ORACLE = oracles.with_user_edges(
    body="""
SELECT src, dst, wgt FROM (
  SELECT COALESCE(b.src, d.src) AS src,
         COALESCE(b.dst, d.dst) AS dst,
         CAST(CASE WHEN d.src IS NULL THEN b.wgt
              WHEN NOT d.had_delete THEN COALESCE(b.wgt, 0) + COALESCE(d.ins_w, 0)
              ELSE d.ins_w END AS BIGINT) AS wgt
  FROM user_edges b FULL OUTER JOIN delta d ON b.src = d.src AND b.dst = d.dst
) WHERE wgt IS NOT NULL AND wgt > 0
""",
    extra_ctes=oracles.ACTIONS_CTE.strip()
    + """,
decoded AS (
  SELECT seq,
         CASE WHEN src < 0 THEN -src - 1 ELSE src END AS u,
         CASE WHEN src < 0 THEN -dst - 1 ELSE dst END AS v,
         weight, src < 0 AS is_delete
  FROM actions
),
bidir AS (
  SELECT seq, u AS src, v AS dst, weight, is_delete FROM decoded WHERE u <> v
  UNION ALL
  SELECT seq, v AS src, u AS dst, weight, is_delete FROM decoded WHERE u <> v
),
with_del AS (
  SELECT *, MAX(CASE WHEN is_delete THEN seq END)
              OVER (PARTITION BY src, dst) AS last_del
  FROM bidir
),
delta AS (
  SELECT src, dst,
         CAST(SUM(CASE WHEN NOT is_delete
                   AND seq > COALESCE(last_del, -4611686018427387904)
                  THEN weight END) AS BIGINT) AS ins_w,
         MAX(last_del) IS NOT NULL AS had_delete
  FROM with_del GROUP BY src, dst
)""",
)


@register("apply_actions", _APPLY_ACTIONS_ORACLE)
def q_apply_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge table after merging the complement-encoded action stream
    with the reference's sequential-replay semantics
    (``tests/stinger/main.c:165-204``, ``tests/sqlite/test.c:338-362``)."""
    g = datasets.user_graph(spark, sf_dir)
    acts = datasets.actions_stream(spark, sf_dir)
    return upd.apply_actions(g.edges, acts)


@register("apply_actions_pruned_store", _APPLY_ACTIONS_ORACLE)
def q_apply_actions_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same merge as ``apply_actions`` but through the
    partition-pruned edge STORE: the table lives as hash-partitioned
    parquet, the batch rewrites only touched partitions (dynamic
    partition overwrite + manifest diff), and the read-back must be
    bit-identical to the full-table merge — the storage path that
    replaces O(|E|) rewrites with O(touched/B · |E|) at 100 TB
    (STINGER's in-place edge-block update,
    ``include/core/stinger-internal.h``, as immutable files)."""
    import shutil
    import tempfile

    g = datasets.user_graph(spark, sf_dir)
    acts = datasets.actions_stream(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="edge_store_")
    try:
        store = f"{tmp}/edges"
        upd.init_edge_store(g.edges, store, n_parts=32)
        upd.apply_actions_pruned(spark, store, acts, n_parts=32)
        # materialize off the tempdir so the files can be removed
        # before the caller collects
        return upd.read_edge_store(spark, store).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# relational layer: TPC-H-style aggregation (SURVEY.md §2.6 first-class aggs)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1e0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1e0 - l_discount) * (1e0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary.  Money sums aggregate as
    DECIMAL (exact, order-independent) then cast to DOUBLE so the
    value-hash matches DuckDB despite double-summation order
    differing between engines."""
    li = datasets.load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    dec2 = "decimal(18,2)"
    dec6 = "decimal(18,6)"
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast(dec2)).cast("double").alias("sum_base_price"),
        F.sum(disc_price.cast(dec6)).cast("double").alias("sum_disc_price"),
        F.sum(charge.cast(dec6)).cast("double").alias("sum_charge"),
        (F.sum(F.col("l_quantity").cast(dec2)).cast("double") / F.count("*")).alias(
            "avg_qty"
        ),
        (
            F.sum(F.col("l_extendedprice").cast(dec2)).cast("double") / F.count("*")
        ).alias("avg_price"),
        F.count("*").alias("count_order"),
    )
