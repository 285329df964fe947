"""aggregate_messages (§2.9 vertex-program primitive) tests: each
kernel's superstep re-expressed generically must agree with the
specialized operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_testing_spark.operators.messages import aggregate_messages


def test_degree_via_messages(spark, bridged_cliques):
    verts = bridged_cliques.select(F.col("src").alias("id")).distinct()
    deg_msg = {
        r.id: r.deg
        for r in aggregate_messages(
            bridged_cliques,
            verts,
            agg=F.sum("msg").alias("deg"),
            to_dst=F.lit(1),
        ).collect()
    }
    deg_direct = {
        r.id: r.deg
        for r in bridged_cliques.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("deg"))
        .collect()
    }
    assert deg_msg == deg_direct


def test_cc_min_label_round_via_messages(spark, path_graph):
    state = path_graph.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    )
    nxt = aggregate_messages(
        path_graph,
        state,
        agg=F.min("msg").alias("nbr_label"),
        to_dst=F.col("src_label"),
    )
    merged = {
        r.id: r.label
        for r in state.join(nxt, "id", "left")
        .select(
            "id", F.least("label", F.coalesce("nbr_label", "label")).alias("label")
        )
        .collect()
    }
    # one min-label round on the 0-1-2-3-4 path (+ disjoint 10-11):
    # every vertex takes min(own, neighbors')
    assert merged[0] == 0 and merged[1] == 0 and merged[2] == 1
    assert merged[10] == 10 and merged[11] == 10


def test_pagerank_round_via_messages_matches_kernel(spark, bridged_cliques):
    from graphdb_testing_spark.operators.pagerank import pagerank

    deg = bridged_cliques.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("degree")
    )
    nv = deg.count()
    state = deg.select("id", F.lit(1.0 / nv).alias("pr"), "degree")
    mass = aggregate_messages(
        bridged_cliques,
        state,
        agg=F.sum("msg").alias("mass"),
        to_dst=F.col("src_pr") / F.col("src_degree"),
    )
    pr_msg = {
        r.id: round(r.pr, 10)
        for r in mass.select(
            "id", (F.lit(0.15 / nv) + F.lit(0.85) * F.col("mass")).alias("pr")
        ).collect()
    }
    pr_kernel = {
        r.id: round(r.pr, 10) for r in pagerank(bridged_cliques, num_iter=1).collect()
    }
    assert pr_msg == pr_kernel


def test_messages_both_directions_and_validation(spark, path_graph):
    verts = path_graph.select(F.col("src").alias("id")).distinct()
    both = aggregate_messages(
        path_graph,
        verts,
        agg=F.sum("msg").alias("deg2"),
        to_dst=F.lit(1),
        to_src=F.lit(1),
    )
    # symmetric graph: sending both ways doubles the degree
    deg = {r.id: r.deg2 for r in both.collect()}
    direct = {
        r.id: 2 * r.n
        for r in path_graph.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert deg == direct
    with pytest.raises(ValueError):
        aggregate_messages(path_graph, verts, agg=F.sum("msg").alias("x"))
