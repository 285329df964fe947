"""Parity tests for the guarded dense-adjacency kernels (round-10
optimization): every dense kernel must be bit-identical to the wedge
join plan it fast-paths, and the guard must actually gate it."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphdb_testing_spark.operators import densegraph, linkpred, triangles


def _random_sym_edges(spark, nv=40, p=0.3, seed=11):
    rng = random.Random(seed)
    rows = []
    for u in range(nv):
        for v in range(u + 1, nv):
            if rng.random() < p:
                rows.append((u, v))
                rows.append((v, u))
    return spark.createDataFrame(rows, "src long, dst long")


def _wedge_ntri(spark, edges):
    """Reference wedge-join formulation (pre-round-10 plan)."""
    tri = triangles._oriented_triangles(edges)
    corners = tri.select(F.explode(F.array("a", "u", "v")).alias("id"))
    counts = corners.groupBy("id").agg((2 * F.count("*")).alias("ntri"))
    all_ids = edges.select(F.col("src").alias("id")).distinct()
    return all_ids.join(counts, "id", "left").select(
        "id", F.coalesce("ntri", F.lit(0)).alias("ntri")
    )


def test_dense_triangles_match_wedge_join(spark):
    edges = _random_sym_edges(spark)
    ctx = densegraph.dense_ctx(edges, symmetric=True)
    assert ctx is not None
    got = {r["id"]: r["ntri"] for r in densegraph.dense_triangles_per_vertex(ctx).collect()}
    want = {r["id"]: r["ntri"] for r in _wedge_ntri(spark, edges).collect()}
    assert got == want


def test_triangles_per_vertex_guard_fallback_agrees(spark, monkeypatch):
    edges = _random_sym_edges(spark, nv=25, p=0.4, seed=5)
    fast = {r["id"]: r["ntri"] for r in triangles.triangles_per_vertex(edges).collect()}
    monkeypatch.setattr(densegraph, "DENSE_NV_MAX", 0)
    slow = {r["id"]: r["ntri"] for r in triangles.triangles_per_vertex(edges).collect()}
    assert fast == slow


def test_dense_edge_support_matches_fallback(spark, monkeypatch):
    edges = _random_sym_edges(spark, nv=30, p=0.35, seed=9)
    canon = edges.filter("src < dst").select("src", "dst").distinct()
    fast = {
        (r["src"], r["dst"]): r["sup"]
        for r in triangles.edge_triangle_support(canon).collect()
    }
    monkeypatch.setattr(densegraph, "DENSE_NV_MAX", 0)
    slow = {
        (r["src"], r["dst"]): r["sup"]
        for r in triangles.edge_triangle_support(canon).collect()
    }
    assert fast == slow
    assert any(v == 0 for v in fast.values()) or len(fast) > 0


def test_dense_adamic_adar_matches_fallback(spark, monkeypatch):
    edges = _random_sym_edges(spark, nv=35, p=0.25, seed=13)
    cols = ["u", "v", "common_neighbors", "aa_score_micro"]
    fast = {tuple(r[c] for c in cols) for r in linkpred.adamic_adar(edges).collect()}
    monkeypatch.setattr(densegraph, "DENSE_NV_MAX", 0)
    slow = {tuple(r[c] for c in cols) for r in linkpred.adamic_adar(edges).collect()}
    assert fast == slow
    assert fast  # non-trivial fixture


def test_adamic_adar_center_cap_uses_wedge_path(spark):
    """max_center_degree changes which centers count — the dense path
    must not fire (it would count capped hubs)."""
    edges = _random_sym_edges(spark, nv=20, p=0.5, seed=3)
    capped = linkpred.adamic_adar(edges, max_center_degree=5)
    uncapped = linkpred.adamic_adar(edges)
    # sanity: the cap genuinely drops score mass on this dense fixture
    s_cap = capped.agg(F.sum("aa_score_micro")).collect()[0][0] or 0
    s_all = uncapped.agg(F.sum("aa_score_micro")).collect()[0][0] or 0
    assert s_cap <= s_all


def test_dense_two_hop_matches_join_formulation(spark):
    edges = _random_sym_edges(spark, nv=30, p=0.15, seed=21)
    ctx = densegraph.dense_ctx(edges, symmetric=True)
    got = {
        r["id"]: r["n_ball2_exact"]
        for r in densegraph.dense_two_hop_sizes(ctx).collect()
    }
    e = edges
    want_df = (
        e.alias("a")
        .join(e.alias("b"), F.col("a.dst") == F.col("b.src"))
        .select(F.col("a.src").alias("id"), F.col("b.dst").alias("ball"))
        .unionByName(e.select(F.col("src").alias("id"), F.col("dst").alias("ball")))
        .unionByName(e.select(F.col("src").alias("id"), F.col("src").alias("ball")))
        .distinct()
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("n"))
    )
    want = {r["id"]: r["n"] for r in want_df.collect()}
    assert got == want


def test_dense_codegree_stats_match_wedge(spark):
    edges = _random_sym_edges(spark, nv=30, p=0.3, seed=31)
    nbrs = edges.select("src", "dst").distinct()
    ctx = densegraph.dense_ctx(nbrs, symmetric=True)
    got = densegraph.dense_codegree_stats(ctx).collect()[0]
    a, b = nbrs.alias("a"), nbrs.alias("b")
    codeg = (
        a.join(
            b,
            (F.col("a.dst") == F.col("b.dst")) & (F.col("a.src") < F.col("b.src")),
        )
        .groupBy(F.col("a.src"), F.col("b.src"))
        .agg(F.count("*").alias("c"))
    )
    pairs = F.sum(F.col("c") * (F.col("c") - 1) / 2)
    want = codeg.agg(
        (pairs / 2).cast("long").alias("n_4cycles"),
        pairs.cast("long").alias("n_codeg_pairs"),
    ).collect()[0]
    assert (got["n_4cycles"], got["n_codeg_pairs"]) == (
        want["n_4cycles"],
        want["n_codeg_pairs"],
    )


def test_dense_ctx_diag_cleared_and_canonical_input(spark):
    canon = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 7)], "src long, dst long"
    )
    ctx = densegraph.dense_ctx(canon, symmetric=False)
    m = ctx.bc.value
    # diagonal cleared: vertex 0's own bit not set
    for vi in range(ctx.nv):
        assert not (int(m[vi, vi >> 6]) >> (vi & 63)) & 1
    sup = {
        (r["src"], r["dst"]): r["sup"]
        for r in densegraph.dense_edge_support(ctx).collect()
    }
    assert sup == {(1, 2): 1, (2, 3): 1, (1, 3): 1, (3, 7): 0}


def test_dense_guard_rejects_large_nv(spark):
    assert densegraph.DENSE_NV_MAX == 4096
    big = spark.range(0, 5000).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    assert densegraph.dense_ctx(big.unionAll(big.select(F.col("dst").alias("src"), F.col("src").alias("dst"))), symmetric=True) is None
