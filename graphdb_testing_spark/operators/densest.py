"""Densest-subgraph peeling (Charikar's greedy 2-approximation,
bounded rounds).

Each round removes every vertex whose degree is at most the current
average degree (the parallel variant of Charikar 2000 analyzed by
Bahmani et al. 2012: O(log n) rounds, (2+ε)-approximation) and records
the surviving subgraph's size — the round with the best edge/vertex
ratio certifies the densest-subgraph approximation.

Everything per round is one degree aggregate + one semi-join — counts
only, no floats in the loop, so the bounded-round trace is exactly
SQL-expressible and hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def densest_subgraph_peeling(edges: DataFrame, rounds: int = 6) -> DataFrame:
    """``(round, nv, ne, density)`` per peeling round (round 0 = the
    input graph; ``ne`` counts canonical ``src < dst`` edges;
    ``density = ne / nv`` rounded to 6).  Peeling rule: drop vertices
    with ``2 * deg * nv <= 2 * ne_directed`` — i.e. ``deg ≤ avg``,
    compared in integers so both engines branch identically.  Stops
    early when the graph is empty or no vertex qualifies."""
    spark = edges.sparkSession
    cur = edges.select("src", "dst").distinct().localCheckpoint()
    trace: list[tuple[int, int, int]] = []
    for r in range(rounds + 1):
        deg = cur.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint()
        nv = deg.count()
        ne_directed = cur.count()
        trace.append((r, nv, ne_directed // 2))
        if r == rounds:
            break
        if nv == 0:
            # stay aligned with the oracle's fixed unroll: an empty
            # graph stays empty for every remaining round
            for r2 in range(r + 1, rounds + 1):
                trace.append((r2, 0, 0))
            break
        # integer comparison: deg <= avg  <=>  deg * nv <= ne_directed
        keep = deg.filter(F.col("deg") * nv > ne_directed).select("src")
        nxt = (
            cur.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint()
        )
        if nxt.count() == ne_directed:
            # nothing peeled — fixpoint; replicate the remaining rounds
            # implicitly (they would be identical) and stop
            for r2 in range(r + 1, rounds + 1):
                trace.append((r2, nv, ne_directed // 2))
            break
        cur = nxt
    out = spark.createDataFrame(trace, "round long, nv long, ne long")
    return out.select(
        "round",
        "nv",
        "ne",
        F.round(
            F.when(F.col("nv") == 0, 0.0).otherwise(
                F.col("ne") / F.col("nv").cast("double")
            ),
            6,
        ).alias("density"),
    )
