"""Link prediction: common-neighbor / Adamic–Adar scores for
non-adjacent vertex pairs.

The classic similarity-based link predictor (Adamic & Adar 2003;
Liben-Nowell & Kleinberg 2003): for a candidate pair ``(u, v)`` the
score is ``Σ_{w ∈ N(u)∩N(v)} 1 / ln(deg(w))`` — shared rare
neighbors count more than shared hubs.

Spark-first plan: candidate pairs come from the wedge join (two scans
of the symmetric edge list joined on the center ``w``), grouped
map-side per ``(u, v)``; existing edges are removed with one anti
join.  The wedge relation is ``Σ deg(w)²`` rows — the same shape as
the triangle join, so AQE skew splitting handles hub centers; for
100 TB graphs a degree cap on ``w`` (drop centers above ``~√m`` —
hubs contribute ≈0 per-pair weight anyway) bounds the blow-up, and
is exposed as ``max_center_degree``.

Determinism: each term is quantized to integer *micros*
(``round(1e6 / ln(deg))``) before summation, so the per-pair score is
an order-independent BIGINT sum — exact lockstep with the DuckDB
oracle, immune to float summation order across partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def adamic_adar(edges: DataFrame, max_center_degree: int | None = None) -> DataFrame:
    """``(u, v, common_neighbors, aa_score_micro)`` for every
    non-adjacent canonical pair ``u < v`` with ≥1 common neighbor.

    ``aa_score_micro = Σ round(1e6 / ln(deg(w)))`` over common
    neighbors ``w`` (integer micros — see module docstring).
    ``edges`` must be symmetric (both directions present).
    """
    # materialize the distinct neighbor relation ONCE — it is
    # referenced four times below (degree, both wedge sides, the
    # anti-join) and Catalyst does not share common subplans, so an
    # un-checkpointed derived edge table (e.g. the events self-join
    # behind user_graph) would be recomputed per reference
    nbrs = edges.select("src", "dst").distinct().localCheckpoint()
    deg = nbrs.groupBy(F.col("src").alias("w")).agg(
        F.count("*").cast("long").alias("deg")
    )
    centers = deg.filter(F.col("deg") >= 2)
    if max_center_degree is not None:
        centers = centers.filter(F.col("deg") <= max_center_degree)
    weighted = centers.withColumn(
        "term", F.round(F.lit(1000000.0) / F.log(F.col("deg"))).cast("long")
    )
    if max_center_degree is None:
        # guarded dense-adjacency fast path (operators/densegraph.py):
        # the AA wedge join materializes Σ deg² rows — 1.67 B at sf0.1
        # (1,500 vertices, 70 % dense) — where blocked integer matmuls
        # over the 280 KB packed adjacency compute the identical
        # counts and micro-term sums.  The term vector stays
        # Spark-computed (same F.round expression as the wedge path),
        # so rounding semantics cannot diverge.  Past DENSE_NV_MAX, or
        # with a center-degree cap (the 100 TB knob, which changes
        # which centers count), the wedge join below runs.
        from .densegraph import dense_adamic_adar, dense_ctx

        ctx = dense_ctx(nbrs, symmetric=True)
        if ctx is not None:
            import numpy as np

            tv = np.zeros(ctx.nv, dtype=np.int64)
            for r in (
                ctx.ids.join(weighted, ctx.ids.id == weighted.w)
                .select("vi", "term")
                .collect()
            ):  # bounded: ≤ DENSE_NV_MAX rows
                tv[r["vi"]] = r["term"]
            return dense_adamic_adar(ctx, tv)
    # the cap must prune BEFORE the wedge self-join — joining the
    # capped relation afterwards would still materialize the hub's
    # deg² wedge rows first (Catalyst executes joins as written)
    half = nbrs.select(F.col("src").alias("w"), F.col("dst").alias("n")).join(
        weighted.select("w"), "w", "left_semi"
    )
    wedges = (
        half.withColumnRenamed("n", "u")
        .join(half.withColumnRenamed("n", "v"), "w")
        .filter(F.col("u") < F.col("v"))
    )
    scored = (
        wedges.join(weighted, "w")
        .groupBy("u", "v")
        .agg(
            F.count("*").cast("long").alias("common_neighbors"),
            F.sum("term").alias("aa_score_micro"),
        )
    )
    existing = nbrs.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    return scored.join(existing, ["u", "v"], "left_anti")
