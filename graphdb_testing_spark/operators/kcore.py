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


def core_numbers(edges: DataFrame, max_rounds: int = 100, k_max: int | None = None) -> DataFrame:
    """``(id, core)`` — max k such that the vertex survives k-core
    peeling (the reference outputs the max-k labels plus per-k counts,
    ``static_kcore.c:12-57``).

    Algorithm: iterated neighborhood h-index (Lü et al. 2016) — init
    ``c(v) = degree(v)``; each round ``c'(v) = h-index of neighbors'
    c values``; the fixpoint is exactly the core number.  Rounds are
    O(graph radius)-ish in practice, each one join + one window — far
    cheaper than peeling k levels sequentially (a 100-core graph
    costs ~100 peel fixpoints the telescope way, ~10 rounds this
    way).  ``k_max`` is accepted for API compatibility and ignored.
    """
    from pyspark.sql import Window

    e = edges.select("src", "dst")
    state = (
        e.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("core"))
        .localCheckpoint()
    )
    nv = state.count()
    # cores only decrease, so Σcore strictly drops on any change — a
    # single-table aggregate over the cached state replaces a
    # join-based changed-flag test (one fewer stage per round)
    prev_sum = state.agg(F.sum("core")).collect()[0][0]
    for _ in range(max_rounds):
        nbr = e.join(
            state_hint(state.withColumnRenamed("id", "dst"), nv), "dst"
        ).select(F.col("src").alias("id"), F.col("core").alias("c_nbr"))
        # histogram h-index: pre-aggregate to (id, value, multiplicity)
        # so the map side combines before the shuffle and the per-id
        # sort runs over distinct neighbor values, not every edge row;
        # h = max over values v of min(v, #neighbors with c >= v),
        # with the running count taken at each distinct value.
        hist = nbr.groupBy("id", "c_nbr").agg(F.count("*").alias("cnt"))
        w = (
            Window.partitionBy("id")
            .orderBy(F.desc("c_nbr"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        hidx = (
            hist.withColumn("cum", F.sum("cnt").over(w))
            .select("id", F.least(F.col("c_nbr"), F.col("cum")).alias("h"))
            .groupBy("id")
            .agg(F.max("h").alias("new_core"))
        )
        new_state = (
            state.join(state_hint(hidx, nv), "id", "left")
            .select(
                "id",
                F.least(
                    F.col("core"), F.coalesce("new_core", F.lit(0))
                ).alias("core"),
            )
            .localCheckpoint()
        )
        new_sum = new_state.agg(F.sum("core")).collect()[0][0]
        state.unpersist()
        state = new_state
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return state.select("id", F.col("core").cast("int").alias("core"))
