"""Synchronous label propagation (LPA) community detection.

Raghavan et al. 2007, made deterministic for oracle checking: every
round, each vertex adopts the most frequent label among its
*neighbors* (self excluded), breaking frequency ties toward the
smallest label; labels start as vertex ids.  Synchronous rounds with
a fixed count (the common distributed variant — GraphX's
LabelPropagation uses the same schedule) rather than the paper's
random asynchronous sweep, which is unreproducible across runs.

Scale shape per round: one equi-join (labels ⋈ edges on the source)
shuffled on the join key, one map-side-combined ``(dst, label)``
count, one per-vertex top-1 — all partial-aggregatable; state is one
row per vertex.  ``localCheckpoint`` every other round caps plan
growth exactly like the PageRank/CC drivers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """``(id, label)`` after ``rounds`` synchronous LPA rounds."""
    # one materialization: the per-round join would otherwise re-run
    # the (possibly derived) edge pipeline every round
    nbrs = edges.select("src", "dst").distinct().localCheckpoint()
    labels = nbrs.select(F.col("src").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    for r in range(rounds):
        counts = (
            nbrs.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"), "label")
            .agg(F.count("*").alias("c"))
        )
        win = Window.partitionBy("id").orderBy(F.desc("c"), F.asc("label"))
        labels = (
            counts.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") == 1)
            .select("id", "label")
        )
        if r % 2 == 1:
            labels = labels.localCheckpoint()
    return labels
