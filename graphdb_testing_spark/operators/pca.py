"""Dominant principal direction via power iteration — deterministic
across engines.

The covariance matrix is exact BIGINT arithmetic (the 1024-scaled
integerization of ``embedding_dim_stats`` / ``embedding_covariance_
topk``: ``cov_num = n·Σxy − Σx·Σy``).  The iteration then runs in
DOUBLE, but every sum is a *left fold in index order* —
``aggregate(zip_with(row, v, ...))`` on Spark, ``list_reduce`` over a
``list_zip`` in DuckDB — so the float additions happen in the same
order on both engines and the result is bit-identical, no
order-of-shuffle nondeterminism.  No normalization inside the loop
(doubles hold ~1e308; eight unnormalized rounds of a ≤1e17-scale
matrix peak around 1e150), so there is no sqrt/divide boundary to
disagree on; the final loadings are reported relative to the
max-|v| component.

Scale shape: the covariance build is the map-side pair expansion of
``embedding_covariance_topk`` (no self-join; shuffle is ≤ d² groups
regardless of row count).  The d×d matrix then collapses to a SINGLE
ROW of nested arrays and the whole iteration is JVM array expressions
— O(d²) work independent of corpus size, which is exactly how a
100 TB PCA should look after the one pass over the data.

Cited semantics: power iteration per Golub & Van Loan, Matrix
Computations §7.3; the reference's iterative-kernel loop discipline
(``operators/pagerank.py``) applied to a dense operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DOT = (
    "aggregate(zip_with(row, v, (x, y) -> x * y), "
    "cast(0.0 as double), (acc, z) -> acc + z)"
)


def _cov_matrix(emb: DataFrame, dim: int) -> DataFrame:
    """Full symmetric (i, j, a) covariance matrix, exact BIGINT
    numerator cast to DOUBLE.  ``i``/``j`` are 1-based."""
    iv = emb.select(
        F.expr(
            "transform(embedding, x -> cast(floor(cast(x as double) * 1024) as bigint))"
        ).alias("iv")
    ).localCheckpoint()
    e1 = iv.select(F.posexplode("iv").alias("i0", "xi"), F.col("iv"))
    pairs = e1.select(
        (F.col("i0") + 1).cast("long").alias("i"),
        F.posexplode("iv").alias("j0", "xj"),
        F.col("xi"),
    ).select(
        "i",
        (F.col("j0") + 1).cast("long").alias("j"),
        (F.col("xi") * F.col("xj")).alias("xy"),
    )
    sxy = pairs.groupBy("i", "j").agg(F.sum("xy").alias("sxy"))
    dsum = (
        iv.select(F.posexplode("iv").alias("i0", "x"))
        .groupBy((F.col("i0") + 1).cast("long").alias("d"))
        .agg(F.sum("x").alias("sx"))
    )
    nn = iv.agg(F.count("*").alias("c"))
    return (
        sxy.join(F.broadcast(dsum.select(F.col("d").alias("i"), F.col("sx").alias("sxi"))), "i")
        .join(F.broadcast(dsum.select(F.col("d").alias("j"), F.col("sx").alias("sxj"))), "j")
        .crossJoin(F.broadcast(nn))
        .select(
            "i",
            "j",
            (F.col("c") * F.col("sxy") - F.col("sxi") * F.col("sxj"))
            .cast("long")
            .cast("double")
            .alias("a"),
        )
    )


def power_iteration_loadings(
    emb: DataFrame, dim: int = 64, rounds: int = 8
) -> DataFrame:
    """``(dim, loading_micro)``: the dominant covariance eigenvector
    after ``rounds`` unnormalized power steps from the all-ones
    start, scaled so the max-|v| component is ±1e6."""
    cov = _cov_matrix(emb, dim)
    mat = (
        cov.groupBy("i")
        .agg(F.sort_array(F.collect_list(F.struct("j", "a"))).alias("r"))
        .select("i", F.expr("transform(r, s -> s.a)").alias("row"))
        .groupBy()
        .agg(F.sort_array(F.collect_list(F.struct("i", "row"))).alias("rs"))
        .select(F.expr("transform(rs, s -> s.row)").alias("m"))
        .withColumn(
            "v",
            F.expr(f"transform(sequence(1, {dim}), x -> cast(1.0 as double))"),
        )
    )
    # checkpoint each round: Catalyst collapses the projection chain,
    # inlining v's whole expression into the next round's lambda — the
    # tree grows geometrically and analysis/codegen stalls by round ~6.
    # The state is ONE ROW, so the checkpoint is free.
    mat = mat.localCheckpoint()
    for _ in range(rounds):
        mat = mat.withColumn(
            "v", F.expr(f"transform(m, row -> {_DOT})")
        ).localCheckpoint()
    final = mat.select(
        "v",
        F.expr("transform(v, x -> abs(x))").alias("ax"),
    ).select(
        "v",
        F.expr("element_at(v, cast(array_position(ax, array_max(ax)) as int))").alias(
            "denom"
        ),
    )
    return final.select(
        F.posexplode("v").alias("d0", "val"), F.col("denom")
    ).select(
        (F.col("d0") + 1).cast("long").alias("dim"),
        F.floor(F.lit(1e6) * F.col("val") / F.col("denom")).cast("long").alias(
            "loading_micro"
        ),
    )


def power_iteration_oracle_sql(dim: int = 64, rounds: int = 8) -> str:
    """DuckDB CTE chain computing the identical iteration with
    ``list_reduce`` left folds (same index order → bit-identical
    doubles).  Final relation: ``pca_result(dim, loading_micro)``."""
    dot = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(list_zip(row, v), p -> p[1] * p[2])), (acc, z) -> acc + z)"
    )
    ctes = [
        f"""piv AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS iv
  FROM embeddings
)""",
        f"""pdims AS MATERIALIZED (
  SELECT vec_id, t.i AS i, iv[t.i] AS x
  FROM piv, UNNEST(generate_series(1, {dim})) t(i)
)""",
        "pdsum AS (SELECT i, SUM(x) AS sx FROM pdims GROUP BY i)",
        "pnn AS (SELECT COUNT(*) AS c FROM piv)",
        """psxy AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS sxy
  FROM pdims a JOIN pdims b ON a.vec_id = b.vec_id
  GROUP BY 1, 2
)""",
        """pcov AS (
  SELECT p.i, p.j,
         CAST(CAST(pnn.c * p.sxy - sa.sx * sb.sx AS BIGINT) AS DOUBLE) AS a
  FROM psxy p
  JOIN pdsum sa ON sa.i = p.i
  JOIN pdsum sb ON sb.i = p.j
  CROSS JOIN pnn
)""",
        """prows AS (
  SELECT i, list(a ORDER BY j) AS row FROM pcov GROUP BY i
)""",
        f"""pm0 AS (
  SELECT list(row ORDER BY i) AS m,
         list_transform(range(1, {dim + 1}), x -> CAST(1.0 AS DOUBLE)) AS v
  FROM prows
)""",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""pm{r} AS (
  SELECT m, list_transform(m, row -> {dot}) AS v FROM pm{r - 1}
)"""
        )
    ctes.append(
        f"""pfin AS (
  SELECT v,
         v[list_position(list_transform(v, x -> abs(x)),
                         list_aggregate(list_transform(v, x -> abs(x)), 'max'))]
           AS denom
  FROM pm{rounds}
)"""
    )
    ctes.append(
        f"""pca_result AS (
  SELECT CAST(t.d AS BIGINT) AS dim,
         CAST(FLOOR(1e6 * v[t.d] / denom) AS BIGINT) AS loading_micro
  FROM pfin, UNNEST(generate_series(1, {dim})) t(d)
)"""
    )
    return ",\n".join(ctes)


def pca_projection_scores(emb: DataFrame, dim: int = 64, rounds: int = 8) -> DataFrame:
    """``(vec_id, proj_micro)``: each vector's projection onto the
    dominant direction of :func:`power_iteration_loadings`, as
    ``floor(1e6 · Σ x_d · loading_d)`` with the sum a left fold in
    index order (bit-identical cross-engine).  The 1-D reduction used
    for embedding outlier triage: extreme projections mark vectors
    dominated by the corpus's main variance axis.  The direction is a
    single broadcast row; the scoring pass is map-only."""
    v = power_iteration_loadings(emb, dim=dim, rounds=rounds)
    vrow = (
        v.groupBy()
        .agg(F.sort_array(F.collect_list(F.struct("dim", "loading_micro"))).alias("ls"))
        .select(
            F.expr(
                "transform(ls, s -> cast(s.loading_micro as double) / 1e6)"
            ).alias("w")
        )
    )
    return (
        emb.select(
            "vec_id",
            F.expr(
                "transform(embedding, x -> cast(x as double))"
            ).alias("xd"),
        )
        .crossJoin(F.broadcast(vrow))
        .select(
            "vec_id",
            F.floor(
                F.lit(1e6)
                * F.expr(
                    "aggregate(zip_with(xd, w, (x, y) -> x * y), "
                    "cast(0.0 as double), (acc, z) -> acc + z)"
                )
            )
            .cast("long")
            .alias("proj_micro"),
        )
    )


def pca_projection_oracle_sql(dim: int = 64, rounds: int = 8) -> str:
    """Extends :func:`power_iteration_oracle_sql`'s chain with the
    projection pass.  Final relation: ``pca_proj(vec_id,
    proj_micro)``."""
    base = power_iteration_oracle_sql(dim=dim, rounds=rounds)
    return (
        base
        + f""",
pw AS (
  SELECT list_transform(list(loading_micro ORDER BY dim),
                        l -> CAST(l AS DOUBLE) / 1e6) AS w
  FROM pca_result
),
pca_proj AS (
  SELECT e.vec_id,
         CAST(FLOOR(1e6 * list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(
               list_zip(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), pw.w),
               p -> p[1] * p[2])),
           (acc, z) -> acc + z)) AS BIGINT) AS proj_micro
  FROM embeddings e, pw
)"""
    )


def gram_matrix_arrow(
    emb: DataFrame, dim: int = 64, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """``(i, j, g)`` upper-triangle Gram matrix ``Σ x_i·x_j`` computed
    the ARROW way: each partition reduces its Arrow batches to ONE
    d×d partial ``X^T X`` (numpy matmul), and Spark sums the d²
    partials — shuffle volume is d² rows per partition regardless of
    row count.

    This is the scale path when d is large (at d=1024 the exact
    pair-explode of ``embedding_covariance_topk`` emits n·d²/2 rows;
    the partial-Gram shuffle stays at d²).  Float sums are partition-
    order-dependent, so this variant is NOT oracle-hashed — the
    equivalence test pins it against the exact integer covariance
    within float tolerance (``test_pipeline.py``)."""
    import pandas as pd  # noqa: F401 (schema side)

    def partial_gram(batches):
        import numpy as np
        import pandas as pd

        acc = np.zeros((dim, dim), dtype=np.float64)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]],
                dtype=np.float64,
            )
            acc += X.T @ X
        if not any_rows:
            return
        iu, ju = np.triu_indices(dim)
        yield pd.DataFrame(
            {"i": iu + 1, "j": ju + 1, "g": acc[iu, ju]}
        )

    parts = emb.select(vec_col).mapInPandas(
        partial_gram, schema="i int, j int, g double"
    )
    return parts.groupBy("i", "j").agg(F.sum("g").alias("g"))
