"""Spectral bisection — deflated power iteration on the Laplacian in
EXACT INTEGER arithmetic, bounded rounds.

The Fiedler direction (eigenvector of the second-smallest Laplacian
eigenvalue) is approximated by power iteration on ``M = C·I − L``
(``C = dmax + 1`` makes M PSD with λ_max(M) = C − λ_min(L)); the
trivial constant eigenvector is removed each round by integer mean
subtraction.  Everything stays BIGINT:

* matrix-vector: ``u_i = Σ_{j∼i} v_j`` is an integer shuffle sum —
  associative, order-independent, no float boundary;
* deflation: ``w_i − (Σw div n)`` (residual constant component < 1
  per entry, re-removed every round);
* rescale: ``div 2^ceil(log2 C)`` — truncating division by a power
  of two, identical on Spark (``div``) and DuckDB (``//``); since
  ``|w| ≤ C·|v|_max``, the rescaled vector never overflows from an
  S = 2^30 start.

The sign pattern of the result is the bisection.  Six rounds are a
coarse Fiedler approximation (power iteration converges at
(C−λ₂)/(C−λ₃) per round) — the point is an exactly-checkable,
shuffle-sum-only spectral kernel, the same discipline as the
integerized PageRank/Katz family.  Cited semantics: Fiedler,
Czech. Math. J. 1973; the reference's partition-quality kernels
(``static_multicontract_clustering.c``) consume exactly this kind of
split.

Scale shape per round: one edges⋈state join keyed on dst (the
PageRank round shape), one scalar aggregate, one map-side transform.
State is one BIGINT per vertex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..hashutil import hash_prefix
from .util import state_hint

_S_BITS = 30  # start magnitude 2^30; |w| ≤ C·2^30 ≤ 2^56 at dmax 2^26
_MAX_C_BITS = 26


def _pow2_ceil(c: F.Column) -> F.Column:
    """Smallest power of two ≥ c (c < 2^26), comparison ladder."""
    expr = F.lit(1 << _MAX_C_BITS)
    for k in range(_MAX_C_BITS - 1, -1, -1):
        expr = F.when(c <= F.lit(1 << k), F.lit(1 << k)).otherwise(expr)
    return expr


def _pow2_ceil_sql(expr: str) -> str:
    branches = "\n".join(
        f"  WHEN {expr} <= {1 << k} THEN {1 << k}"
        for k in range(0, _MAX_C_BITS)
    )
    return f"(CASE\n{branches}\n  ELSE {1 << _MAX_C_BITS} END)"


def spectral_bisection(edges: DataFrame, rounds: int = 6) -> DataFrame:
    """``(id, side, v)`` over a symmetric edge table: ``side`` is the
    sign partition after ``rounds`` integer power steps, ``v`` the
    exact final iterate (hash-checkable)."""
    e = edges.select("src", "dst").localCheckpoint()
    deg = (
        e.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("d"))
        .localCheckpoint()
    )
    nv = deg.count()
    # scalars: C = dmax + 1 and its power-of-two ceiling (exact ints)
    scal = deg.agg((F.max("d") + 1).alias("c")).select(
        "c", _pow2_ceil(F.col("c")).alias("cp")
    )
    # deterministic ±2^30 start, hash-decorrelated from structure
    v = deg.join(F.broadcast(scal), F.lit(True)).select(
        "id",
        "d",
        "c",
        "cp",
        (
            (F.pmod(hash_prefix(F.col("id").cast("string"), 8), F.lit(2)) * 2 - 1)
            * F.lit(1 << _S_BITS)
        ).cast("long").alias("v"),
    ).localCheckpoint()

    for _ in range(rounds):
        u = (
            e.join(
                state_hint(
                    v.select(F.col("id").alias("dst"), F.col("v").alias("vn")), nv
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("vn").alias("u"))
        )
        w = v.join(u, "id", "left").select(
            "id",
            "d",
            "c",
            "cp",
            ((F.col("c") - F.col("d")) * F.col("v") + F.coalesce("u", F.lit(0))).alias(
                "w"
            ),
        )
        sw = w.agg(F.sum("w").alias("sw"), F.count("*").alias("n"))
        v = (
            w.crossJoin(F.broadcast(sw))
            .select(
                "id",
                "d",
                "c",
                "cp",
                F.expr("(w - (sw div n)) div cp").cast("long").alias("v"),
            )
            .localCheckpoint()
        )
    return v.select(
        "id", (F.col("v") > 0).cast("long").alias("side"), F.col("v").alias("v")
    )


def spectral_oracle_sql(edge_view: str, rounds: int = 6) -> str:
    """DuckDB CTE chain unrolling the identical integer rounds.
    Final relation: ``spectral_result(id, side, v)``."""
    ctes = [
        f"""sdeg AS MATERIALIZED (
  SELECT src AS id, COUNT(*) AS d FROM {edge_view} GROUP BY src
)""",
        f"""sscal AS (
  SELECT c, {_pow2_ceil_sql("c")} AS cp
  FROM (SELECT MAX(d) + 1 AS c FROM sdeg)
)""",
        f"""sv0 AS MATERIALIZED (
  SELECT g.id, g.d, s.c, s.cp,
         CAST(((('0x' || substr(md5(g.id::VARCHAR), 1, 8))::BIGINT % 2) * 2 - 1)
              * {1 << _S_BITS} AS BIGINT) AS v
  FROM sdeg g CROSS JOIN sscal s
)""",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""su{r} AS MATERIALIZED (
  SELECT e.src AS id, SUM(x.v) AS u
  FROM {edge_view} e JOIN sv{p} x ON e.dst = x.id
  GROUP BY e.src
)"""
        )
        ctes.append(
            f"""sw{r} AS MATERIALIZED (
  SELECT a.id, a.d, a.c, a.cp,
         (a.c - a.d) * a.v + COALESCE(u.u, 0) AS w
  FROM sv{p} a LEFT JOIN su{r} u USING (id)
)"""
        )
        ctes.append(
            f"ssum{r} AS (SELECT SUM(w) AS sw, COUNT(*) AS n FROM sw{r})"
        )
        ctes.append(
            f"""sv{r} AS MATERIALIZED (
  SELECT w.id, w.d, w.c, w.cp,
         CAST((w.w - (s.sw // s.n)) // w.cp AS BIGINT) AS v
  FROM sw{r} w CROSS JOIN ssum{r} s
)"""
        )
    ctes.append(
        f"""spectral_result AS (
  SELECT id, CAST(CASE WHEN v > 0 THEN 1 ELSE 0 END AS BIGINT) AS side, v
  FROM sv{rounds}
)"""
    )
    return ",\n".join(ctes)
