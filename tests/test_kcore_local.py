"""Parity tests for the guarded single-task k-core fast paths
(round-10 optimization) — peel survivors and h-index core numbers are
exact integers, so the fast path must match the DataFrame loops
exactly, row for row, including bounded-round schedules."""

from __future__ import annotations

import random

import pytest

from graphdb_testing_spark.operators import kcore as kmod


@pytest.fixture(scope="module")
def layered_edges(spark):
    """Three islands of different density plus a chain — distinct core
    numbers per region and >1 peel round."""
    rng = random.Random(31)
    pairs = set()
    for base, deg in ((0, 3), (200, 6), (400, 10)):
        for u in range(base, base + 60):
            for v in rng.sample(range(base, base + 60), deg):
                if u != v:
                    pairs.add((min(u, v), max(u, v)))
    for i in range(600, 640):
        pairs.add((i, i + 1))
    rows = [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]
    return spark.createDataFrame(rows, "src long, dst long").localCheckpoint()


@pytest.mark.parametrize("k,max_rounds", [(3, None), (3, 8), (5, None), (1, 2)])
def test_local_kcore_vertices_matches(spark, layered_edges, monkeypatch, k, max_rounds):
    fast = {r["id"] for r in kmod.kcore_vertices(layered_edges, k, max_rounds).collect()}
    monkeypatch.setattr(kmod, "LOCAL_NE_MAX", 0)
    slow = {r["id"] for r in kmod.kcore_vertices(layered_edges, k, max_rounds).collect()}
    assert fast == slow


@pytest.mark.parametrize("max_rounds,unroll", [(100, 4), (8, 4), (2, 4), (3, 1)])
def test_local_core_numbers_matches(spark, layered_edges, monkeypatch, max_rounds, unroll):
    fast = {
        (r["id"], r["core"])
        for r in kmod.core_numbers(layered_edges, max_rounds=max_rounds, unroll=unroll).collect()
    }
    monkeypatch.setattr(kmod, "LOCAL_NE_MAX", 0)
    slow = {
        (r["id"], r["core"])
        for r in kmod.core_numbers(layered_edges, max_rounds=max_rounds, unroll=unroll).collect()
    }
    assert fast == slow
    assert len(fast) == 221  # 3×60 islands + 41-vertex chain


def test_local_kcore_empty(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert kmod.kcore_vertices(empty, 3).count() == 0
    assert kmod.core_numbers(empty).count() == 0
