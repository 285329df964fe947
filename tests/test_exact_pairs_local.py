"""Parity test for the single-task exact all-pairs cosine kernel
(round-10): dot/norm accumulate in the same sequential fold order as
the JVM aggregate() and rounding is BigDecimal HALF_UP, so the output
(including the rounded sim column) must be bit-identical to the
self-join formulation."""

from __future__ import annotations

import random

import pytest

from graphdb_testing_spark.functions import simsearch as ss


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = random.Random(73)
    rows = []
    for i in range(300):
        base = [rng.uniform(-1, 1) for _ in range(16)]
        rows.append((i, base))
        if i % 7 == 0:  # planted near-duplicates
            rows.append(
                (1000 + i, [x + rng.uniform(-0.01, 0.01) for x in base])
            )
    rows.append((5000, [0.0] * 16))  # zero-norm guard row
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).localCheckpoint()


@pytest.mark.parametrize("threshold", [0.4, 0.95])
def test_local_exact_pairs_match(spark, embeddings, monkeypatch, threshold):
    fast = {
        (r["a_id"], r["b_id"], r["sim"])
        for r in ss.embedding_near_duplicates(embeddings, threshold=threshold).collect()
    }
    monkeypatch.setattr(ss, "LOCAL_EXACT_ROWS", 0)
    slow = {
        (r["a_id"], r["b_id"], r["sim"])
        for r in ss.embedding_near_duplicates(embeddings, threshold=threshold).collect()
    }
    assert fast == slow
    assert fast  # planted dups must surface
