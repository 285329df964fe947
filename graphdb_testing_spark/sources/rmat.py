"""Deterministic distributed R-MAT generator.

Reference: ``rmatter/src/rmatter.c:71-118,122-231`` — Kronecker-style
recursive quadrant sampling with A=0.55 B=0.1 C=0.1 D=0.25, ``nv =
2^SCALE``, ``ne = nv * EDGEFACTOR``, then symmetrize + self-loop drop
+ dedup with weight = multiplicity (``:222-291``), and an action
stream with P(delete)=1/16 encoded via bitwise complement
(``:349-369``).

Spark-first: no RNG state — every random draw is a pure column
expression ``xxhash64(edge_id, level, seed)`` mapped to [0, 1), so
the generator is embarrassingly parallel over ``spark.range(ne)``,
reproducible for a given seed at any partitioning/parallelism (the
reference needs per-thread ``dxor128_seed`` state for the same
property), and scales to any ``ne`` without driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import symmetrize

A, B, C, D = 0.55, 0.10, 0.10, 0.25


def _uniform(*cols) -> "F.Column":
    """Deterministic U[0,1) from a 64-bit hash of the arguments."""
    return F.pmod(F.xxhash64(*cols), F.lit(2**32)).cast("double") / F.lit(float(2**32))


def rmat_directed(
    spark: SparkSession,
    scale: int,
    edge_factor: int = 8,
    a: float = A,
    b: float = B,
    c: float = C,
    d: float = D,
    seed: int = 1,
) -> DataFrame:
    """Raw directed R-MAT edges ``(src, dst)`` before canonicalization."""
    ne = (2**scale) * edge_factor
    df = spark.range(ne).select(F.col("id").alias("eid"))
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for lvl in range(scale):
        u = _uniform(F.col("eid"), F.lit(lvl), F.lit(seed))
        # quadrants: A=(0,0) B=(0,1) C=(1,0) D=(1,1)
        src_bit = F.when(u < a + b, 0).otherwise(1)
        dst_bit = (
            F.when(u < a, 0).when(u < a + b, 1).when(u < a + b + c, 0).otherwise(1)
        )
        src = src * 2 + src_bit
        dst = dst * 2 + dst_bit
    return df.select(src.alias("src"), dst.alias("dst"))


def rmat_graph(
    spark: SparkSession, scale: int, edge_factor: int = 8, seed: int = 1, **kw
) -> DataFrame:
    """Canonical R-MAT graph: symmetric, no self-loops, unique
    ``(src,dst)`` with weight = multiplicity — the reference's
    on-disk form (``rmatter.c:222-291``)."""
    return symmetrize(rmat_directed(spark, scale, edge_factor, seed=seed, **kw))


def rmat_actions(
    spark: SparkSession,
    scale: int,
    num_actions: int,
    p_delete: float = 1.0 / 16.0,
    seed: int = 7,
) -> DataFrame:
    """Uniform action stream ``(seq, src, dst, weight)`` over
    ``nv = 2^scale`` with complement-encoded deletions
    (``rmatter.c:349-369``: P(delete)=0.0625, ``~x`` encoding)."""
    nv = 2**scale
    df = spark.range(num_actions).select(F.col("id").alias("seq"))
    i = F.pmod(F.xxhash64(F.col("seq"), F.lit("i"), F.lit(seed)), F.lit(nv))
    j = F.pmod(F.xxhash64(F.col("seq"), F.lit("j"), F.lit(seed)), F.lit(nv))
    is_del = _uniform(F.col("seq"), F.lit("del"), F.lit(seed)) < p_delete
    return df.select(
        "seq",
        F.when(is_del, -i - 1).otherwise(i).alias("src"),
        F.when(is_del, -j - 1).otherwise(j).alias("dst"),
        F.lit(1).cast("long").alias("weight"),
    )
