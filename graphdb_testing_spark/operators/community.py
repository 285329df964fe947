"""Agglomerative community detection ("multicontract").

Reference (``src/alg/static_multicontract_clustering.c``): score each
edge by approximate modularity gain
``w_ij/(vol/2) − 2·w_i·w_j/vol²`` (``:52-98``), filter candidate
matches by a mean/variance threshold (``:100-130``), contract matched
pairs, rebuild the contracted multigraph
(``sum_all_edgeweights:12-33``), repeat until no contraction.

Spark-first design: one level = score (edges ⋈ weighted-degrees ×2)
→ per-vertex argmax (``max_by``) → **mutual**-best matching (a
deterministic, conflict-free subset of the reference's greedy race —
documented deviation: the reference's lock-based racing matcher is
nondeterministic under threads; mutual-best is its deterministic
core) → relabel + ``groupBy(new_src, new_dst).sum`` contraction.
The vertex→community mapping composes across levels with a join per
level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import state_hint


def _score_edges(edges: DataFrame, nv: int | None = None) -> DataFrame:
    """Edge modularity-gain scores (reference ``:52-98``).

    Volume and weighted degrees include contracted self-loops (the
    internal weight of merged communities) — otherwise contraction
    loses volume and the last cross-community merge looks spuriously
    attractive; only non-self edges are match candidates.
    """
    vol = edges.agg(F.sum("wgt").alias("v")).collect()[0]["v"]
    wdeg = edges.groupBy(F.col("src").alias("id")).agg(F.sum("wgt").alias("wd"))
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .join(state_hint(wdeg.withColumnRenamed("id", "src"), nv), "src")
        .withColumnRenamed("wd", "w_src")
        .join(
            state_hint(
                wdeg.withColumnRenamed("id", "dst").withColumnRenamed("wd", "w_dst"),
                nv,
            ),
            "dst",
        )
        .select(
            "src",
            "dst",
            "wgt",
            (
                # float(vol) * float(vol), NOT float(vol) ** 2: C pow()
                # is not guaranteed correctly rounded for x**2, while
                # x*x is a single IEEE op — the SQL oracle squares with
                # vol*vol, and the two must be bit-identical for the
                # score comparisons (>0, argmax) to agree.
                F.col("wgt") / F.lit(vol / 2.0)
                - F.lit(2.0) * F.col("w_src") * F.col("w_dst")
                / F.lit(float(vol) * float(vol))
            ).alias("score"),
        )
    )


def community_agglomeration(
    edges: DataFrame, max_levels: int = 10, min_score_filter: bool = True
) -> DataFrame:
    """``(id, community)`` for every original vertex.

    Levels proceed until no pair contracts or ``max_levels``.
    ``min_score_filter`` applies the reference's mean-based candidate
    filter (scores below the mean are not contracted).
    """
    mapping = (
        edges.select(F.col("src").alias("id")).distinct().withColumn(
            "community", F.col("id")
        )
    ).localCheckpoint()
    nv = mapping.count()
    cur = edges.select("src", "dst", "wgt").localCheckpoint()

    for _ in range(max_levels):
        # only positive modularity gain contracts — the agglomeration
        # stopping rule (merging the last two super-nodes always has
        # negative gain, so the loop terminates at a real clustering)
        # scored feeds BOTH the mean threshold and the argmax —
        # materialize once instead of re-running the score join per use
        scored = _score_edges(cur, nv).filter(F.col("score") > 0).localCheckpoint()
        if min_score_filter:
            stats = scored.agg(F.avg("score").alias("m")).collect()[0]
            if stats["m"] is not None:
                scored = scored.filter(F.col("score") >= stats["m"])
        # best is self-joined for mutuality — keep it materialized too
        best = (
            scored.groupBy("src")
            .agg(F.max_by("dst", F.struct(F.col("score"), -F.col("dst"))).alias("best"))
            .localCheckpoint()
        )
        rev = best.select(
            F.col("src").alias("dst"), F.col("best").alias("best_rev")
        )
        mutual = (
            best.join(rev, best.best == rev.dst)
            .filter(F.col("best_rev") == F.col("src"))
            .filter(F.col("src") < F.col("best"))
            .select(F.col("best").alias("id"), F.col("src").alias("new_id"))
        )
        n_matches = mutual.count()
        if n_matches == 0:
            break
        # relabel: matched high vertex -> its partner (min id).
        # n_matches is known ≤ nv/2, so the checkpointed (stats-less)
        # relabel table gets an explicit broadcast/shuffle hint —
        # without it AQE falls back to shuffling the full edge table
        # against it every level
        relabel = mutual.localCheckpoint()

        def apply_relabel(df: DataFrame, col: str) -> DataFrame:
            r = relabel.withColumnRenamed("id", col).withColumnRenamed(
                "new_id", f"_n_{col}"
            )
            return df.join(state_hint(r, n_matches), col, "left").withColumn(
                col, F.coalesce(f"_n_{col}", col)
            ).drop(f"_n_{col}")

        # keep self-loops: they carry the merged community's internal
        # weight, preserving total volume across levels
        cur = apply_relabel(apply_relabel(cur, "src"), "dst")
        cur = (
            cur.groupBy("src", "dst").agg(F.sum("wgt").alias("wgt")).localCheckpoint()
        )
        r = relabel.withColumnRenamed("id", "community").withColumnRenamed(
            "new_id", "new_comm"
        )
        mapping = (
            mapping.join(state_hint(r, n_matches), "community", "left")
            .select("id", F.coalesce("new_comm", "community").alias("community"))
            .localCheckpoint()
        )
        if cur.count() == 0:
            break
    return mapping


def community_sizes(mapping: DataFrame) -> DataFrame:
    return mapping.groupBy("community").agg(F.count("*").alias("size"))
