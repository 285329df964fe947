"""Parity tests for the guarded single-task weighted-semiring fast
paths in operators/bfs.py (round-10 optimization) — min-plus SSSP,
(max, min) widest path, two-smallest-distinct distances, and
multi-source BFS are all exact-integer, so the fast paths must match
the DataFrame loops row for row."""

from __future__ import annotations

import random

import pytest

from graphdb_testing_spark.operators import bfs as bfsmod


@pytest.fixture(scope="module")
def weighted_edges(spark):
    """Two communities joined by a single heavy bridge plus a weighted
    chain — distinct d1/d2, bottleneck, and multi-level structure."""
    rng = random.Random(53)
    w = {}
    for base in (0, 100):
        for u in range(base, base + 50):
            for v in rng.sample(range(base, base + 50), 4):
                if u != v:
                    w[(min(u, v), max(u, v))] = rng.randint(1, 9)
    w[(49, 100)] = 7  # bridge
    for i in range(200, 230):
        w[(i, i + 1)] = rng.randint(1, 5)
    w[(0, 200)] = 2
    rows = [(u, v, x) for (u, v), x in w.items()] + [
        (v, u, x) for (u, v), x in w.items()
    ]
    return spark.createDataFrame(
        rows, "src long, dst long, wgt long"
    ).localCheckpoint()


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.parametrize("source,rounds", [(0, 6), (0, 2), (205, 4), (99999, 3)])
def test_local_sssp_weighted_matches(spark, weighted_edges, monkeypatch, source, rounds):
    fast = _rows(bfsmod.sssp_weighted(weighted_edges, source, rounds=rounds))
    monkeypatch.setattr(bfsmod, "LOCAL_NE_MAX", 0)
    slow = _rows(bfsmod.sssp_weighted(weighted_edges, source, rounds=rounds))
    assert fast == slow


@pytest.mark.parametrize("source,rounds", [(0, 6), (102, 3), (99999, 2)])
def test_local_widest_path_matches(spark, weighted_edges, monkeypatch, source, rounds):
    fast = _rows(bfsmod.widest_path(weighted_edges, source, rounds=rounds))
    monkeypatch.setattr(bfsmod, "LOCAL_NE_MAX", 0)
    slow = _rows(bfsmod.widest_path(weighted_edges, source, rounds=rounds))
    assert fast == slow


@pytest.mark.parametrize("source,rounds", [(0, 6), (0, 1), (205, 4), (99999, 2)])
def test_local_two_shortest_matches(spark, weighted_edges, monkeypatch, source, rounds):
    fast = _rows(bfsmod.two_shortest(weighted_edges, source, rounds=rounds))
    monkeypatch.setattr(bfsmod, "LOCAL_NE_MAX", 0)
    slow = _rows(bfsmod.two_shortest(weighted_edges, source, rounds=rounds))
    assert fast == slow


@pytest.mark.parametrize(
    "roots,depth", [([0, 102, 215], 32), ([0], 2), ([99999, 3], 8)]
)
def test_local_multi_source_bfs_matches(spark, weighted_edges, monkeypatch, roots, depth):
    fast = _rows(bfsmod.multi_source_bfs(weighted_edges, roots, max_depth=depth))
    monkeypatch.setattr(bfsmod, "LOCAL_NE_MAX", 0)
    slow = _rows(bfsmod.multi_source_bfs(weighted_edges, roots, max_depth=depth))
    assert fast == slow
