"""k-core decomposition by iterative peeling.

Reference semantics (SURVEY.md §2.5 A1, ``tests/stinger/src/alg/
static_kcore.c:12-57``): a vertex is in the k-core if at least k of
its neighbors are in the k-core; computed by repeatedly discarding
vertices of degree < k restricted to the surviving set.

Spark-first design: the surviving vertex set is a small DataFrame;
each peel round is one semi-join + groupBy over the (cached,
pre-partitioned) edge table.  Rounds are bounded in the fixed-round
variant so the DuckDB oracle can unroll the identical computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import state_hint


def kcore_vertices(
    edges: DataFrame, k: int, max_rounds: int | None = None
) -> DataFrame:
    """``(id)`` vertices of the k-core.

    ``max_rounds=None`` peels to fixpoint; a fixed ``max_rounds``
    performs exactly that many peels (deterministic intermediate
    semantics, used by the unrolled SQL oracle).
    """
    e = edges.select("src", "dst")
    active = e.select(F.col("src").alias("id")).distinct().localCheckpoint()
    prev_n = active.count()
    rounds = 0
    while True:
        if max_rounds is not None and rounds >= max_rounds:
            break
        # active is referenced TWICE per round — without lineage
        # truncation the plan doubles every round (2^rounds nodes),
        # so eager-checkpoint instead of persist
        surviving = (
            e.join(
                state_hint(active.select(F.col("id").alias("src")), prev_n),
                "src",
                "left_semi",
            )
            .join(
                state_hint(active.select(F.col("id").alias("dst")), prev_n),
                "dst",
                "left_semi",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= k)
            .select("id")
            .localCheckpoint()
        )
        n = surviving.count()
        active.unpersist()
        active = surviving
        rounds += 1
        if max_rounds is None and n == prev_n:
            break
        if n == 0:
            break
        prev_n = n
    return active


def core_numbers(edges: DataFrame, k_max: int = 64) -> DataFrame:
    """``(id, core)`` — max k such that the vertex survives k-core
    peeling (the reference outputs the max-k labels plus per-k counts,
    ``static_kcore.c:40-57``).  Driver loop over k; each level reuses
    the previous level's survivor set as the starting point, so total
    work is the peeling telescope, not k_max full decompositions.
    """
    e = edges.select("src", "dst")
    result = e.select(F.col("src").alias("id")).distinct().withColumn(
        "core", F.lit(0).cast("int")
    ).persist()
    survivors = result.select("id")
    for k in range(1, k_max + 1):
        survivors = kcore_vertices(
            e.join(survivors.withColumnRenamed("id", "src"), "src", "left_semi"), k
        )
        if survivors.count() == 0:
            break
        upd = survivors.withColumn("k", F.lit(k).cast("int"))
        new_result = (
            result.join(upd, "id", "left")
            .select("id", F.greatest("core", F.coalesce("k", F.lit(0))).alias("core"))
            .persist()
        )
        new_result.count()
        result.unpersist()
        result = new_result
    return result
