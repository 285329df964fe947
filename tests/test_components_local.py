"""Parity tests for the guarded single-task CC / BFS fast paths
(round-10 optimization) — outputs are integer/structural, so the fast
path must match the DataFrame loops exactly, row for row."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from graphdb_testing_spark.operators import bfs as bfsmod
from graphdb_testing_spark.operators import components as compmod


@pytest.fixture(scope="module")
def multi_component_edges(spark):
    rng = random.Random(23)
    pairs = set()
    # three islands with distinct id ranges + a long chain (exercises
    # pointer jumping and >1 BFS level)
    for base in (0, 200, 400):
        for u in range(base, base + 60):
            for v in rng.sample(range(base, base + 60), 3):
                if u != v:
                    pairs.add((min(u, v), max(u, v)))
    for i in range(600, 640):
        pairs.add((i, i + 1))
    rows = [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]
    return spark.createDataFrame(rows, "src long, dst long").localCheckpoint()


def test_local_cc_matches_dataframe_path(spark, multi_component_edges, monkeypatch):
    fast = {
        (r["id"], r["label"])
        for r in compmod.connected_components(multi_component_edges).collect()
    }
    monkeypatch.setattr(compmod, "LOCAL_NE_MAX", 0)
    slow = {
        (r["id"], r["label"])
        for r in compmod.connected_components(multi_component_edges).collect()
    }
    assert fast == slow
    labels = {lab for _, lab in fast}
    assert labels == {0, 200, 400, 600}


def test_local_cc_empty(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert compmod.connected_components(empty).count() == 0


def test_local_bfs_matches_dataframe_path(spark, multi_component_edges, monkeypatch):
    fast = {
        (r["id"], r["dist"])
        for r in bfsmod.bfs(multi_component_edges, 600).collect()
    }
    monkeypatch.setattr(bfsmod, "LOCAL_NE_MAX", 0)
    slow = {
        (r["id"], r["dist"])
        for r in bfsmod.bfs(multi_component_edges, 600).collect()
    }
    assert fast == slow
    # chain end is 40 hops away; islands unreachable (absent)
    assert (640, 40) in fast
    assert len(fast) == 41


def test_local_bfs_max_depth_and_missing_source(spark, multi_component_edges, monkeypatch):
    fast = {
        (r["id"], r["dist"])
        for r in bfsmod.bfs(multi_component_edges, 600, max_depth=3).collect()
    }
    monkeypatch.setattr(bfsmod, "LOCAL_NE_MAX", 0)
    slow = {
        (r["id"], r["dist"])
        for r in bfsmod.bfs(multi_component_edges, 600, max_depth=3).collect()
    }
    assert fast == slow
    assert max(d for _, d in fast) == 3
    monkeypatch.undo()
    seed_only = bfsmod.bfs(multi_component_edges, 99999).collect()
    assert [(r["id"], r["dist"]) for r in seed_only] == [(99999, 0)]
