"""Parity tests for the guarded packed-bitmap intersection kernel
(round-10 optimization) — the fast path must be bit-identical to the
join formulation it replaces, and the guards must actually gate it.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from graphdb_testing_spark.functions import bitsets, dedup


def _random_items(spark, n_docs=60, vocab=45, seed=7):
    rng = random.Random(seed)
    rows = []
    for d in range(n_docs):
        sz = rng.randint(1, 12)
        for it in rng.sample(range(vocab), sz):
            rows.append((d, f"tok{it}"))
    return spark.createDataFrame(rows, "doc_id long, item string")


def _brute_counts(items):
    a = items.select(F.col("doc_id").alias("a_id"), "item")
    b = items.select(F.col("doc_id").alias("b_id"), "item")
    return (
        a.join(b, "item")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").cast("long").alias("inter"))
    )


def test_kernel_matches_join_formulation(spark):
    items = _random_items(spark)
    fast = bitsets.pairwise_intersection_counts(items, "doc_id", "item")
    assert fast is not None, "guard should pass on a 60-doc corpus"
    got = {(r["a_id"], r["b_id"]): r["inter"] for r in fast.collect()}
    want = {
        (r["a_id"], r["b_id"]): r["inter"] for r in _brute_counts(items).collect()
    }
    assert got == want


def test_kernel_dedups_item_multiplicity(spark):
    items = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "x")],
        "doc_id long, item string",
    )
    fast = bitsets.pairwise_intersection_counts(items, "doc_id", "item")
    assert {(r["a_id"], r["b_id"], r["inter"]) for r in fast.collect()} == {
        (1, 2, 1)
    }


def test_min_count_filter(spark):
    items = _random_items(spark, n_docs=30, vocab=20, seed=3)
    fast = bitsets.pairwise_intersection_counts(
        items, "doc_id", "item", min_count=3
    )
    want = {
        (r["a_id"], r["b_id"]): r["inter"]
        for r in _brute_counts(items).filter("inter >= 3").collect()
    }
    got = {(r["a_id"], r["b_id"]): r["inter"] for r in fast.collect()}
    assert got == want


def test_guard_bounds():
    assert bitsets.bitmap_fast_path_ok(5000, 13005)
    assert not bitsets.bitmap_fast_path_ok(bitsets.MAX_DOCS + 1, 10)
    # matrix-bytes bound: 200k docs x 1M items = 3.1 GB >> 64 MB
    assert not bitsets.bitmap_fast_path_ok(200_000, 1_000_000)
    # word-ops bound: 131k docs x 60k items blows the sweep budget
    assert not bitsets.bitmap_fast_path_ok(131_072, 60_000)
    assert not bitsets.bitmap_fast_path_ok(0, 10)


@pytest.fixture()
def tiny_docs(spark):
    rows = [
        (1, "a b c d"),
        (2, "a b c d e"),
        (3, "a b"),
        (4, "x y z"),
        (5, "x y z"),
        (6, "q"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_fast_and_fallback_agree(spark, tiny_docs, monkeypatch):
    fast = {
        (r["a_id"], r["b_id"], r["inter"], r["containment"])
        for r in dedup.containment_join(tiny_docs, threshold=0.6).collect()
    }
    monkeypatch.setattr(bitsets, "MAX_DOCS", 0)
    slow = {
        (r["a_id"], r["b_id"], r["inter"], r["containment"])
        for r in dedup.containment_join(tiny_docs, threshold=0.6).collect()
    }
    assert fast == slow
    assert (3, 1, 2, 1.0) in fast  # {a,b} fully inside {a,b,c,d}


def test_jaccard_prefix_fast_and_fallback_agree(spark, tiny_docs, monkeypatch):
    fast = {
        (r["a_id"], r["b_id"], r["inter"], r["jaccard"])
        for r in dedup.jaccard_prefix_join(tiny_docs, threshold=0.5).collect()
    }
    monkeypatch.setattr(bitsets, "MAX_DOCS", 0)
    slow = {
        (r["a_id"], r["b_id"], r["inter"], r["jaccard"])
        for r in dedup.jaccard_prefix_join(tiny_docs, threshold=0.5).collect()
    }
    assert fast == slow
    assert (4, 5, 3, 1.0) in fast


