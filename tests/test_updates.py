"""Batch update semantics (M1-M5, M13): upsert-increment, both-direction
delete, complement decode, sequential-replay equivalence."""

from __future__ import annotations

from graphdb_testing_spark.operators.updates import (
    apply_actions,
    decode_actions,
    increment_edges,
    insert_edges,
    insert_if_absent,
    remove_edges,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, wgt long")


def _actions(spark, rows):
    """rows: (seq, src, dst, weight) — complement-encoded."""
    return spark.createDataFrame(rows, "seq long, src long, dst long, weight long")


def as_map(df):
    return {(r.src, r.dst): r.wgt for r in df.collect()}


def test_decode_complement(spark):
    acts = _actions(spark, [(0, 5, 7, 1), (1, -6, -8, 1)])
    dec = {(r.seq): (r.src, r.dst, r.is_delete) for r in decode_actions(acts).collect()}
    assert dec[0] == (5, 7, False)
    assert dec[1] == (5, 7, True)  # ~5 = -6, ~7 = -8


def test_insert_is_upsert_increment_both_directions(spark):
    base = _edges(spark, [(1, 2, 10), (2, 1, 10)])
    acts = _actions(spark, [(0, 1, 2, 1), (1, 3, 4, 1)])
    got = as_map(apply_actions(base, acts))
    assert got == {(1, 2): 11, (2, 1): 11, (3, 4): 1, (4, 3): 1}


def test_delete_removes_both_directions(spark):
    base = _edges(spark, [(1, 2, 5), (2, 1, 5), (2, 3, 1), (3, 2, 1)])
    acts = _actions(spark, [(0, -2, -3, 1)])  # delete (1, 2)
    got = as_map(apply_actions(base, acts))
    assert got == {(2, 3): 1, (3, 2): 1}


def test_insert_after_delete_recreates(spark):
    base = _edges(spark, [(1, 2, 5), (2, 1, 5)])
    acts = _actions(
        spark,
        [(0, 1, 2, 1), (1, -2, -3, 1), (2, 1, 2, 1), (3, 1, 2, 1)],
    )
    # replay: 5 -> 6 -> deleted -> 1 -> 2
    got = as_map(apply_actions(base, acts))
    assert got == {(1, 2): 2, (2, 1): 2}


def test_self_loops_skipped(spark):
    base = _edges(spark, [])
    acts = _actions(spark, [(0, 4, 4, 1), (1, 4, 5, 1)])
    got = as_map(apply_actions(base, acts))
    assert got == {(4, 5): 1, (5, 4): 1}


def test_primitive_insert_set_weight(spark):
    base = _edges(spark, [(1, 2, 5)])
    new = _edges(spark, [(1, 2, 9), (7, 8, 3)])
    got = as_map(insert_edges(base, new))
    assert got == {(1, 2): 9, (7, 8): 3}


def test_primitive_increment(spark):
    base = _edges(spark, [(1, 2, 5)])
    inc = _edges(spark, [(1, 2, 2), (1, 2, 1), (9, 9, 4)])
    got = as_map(increment_edges(base, inc))
    assert got == {(1, 2): 8, (9, 9): 4}


def test_primitive_remove_and_insert_or_ignore(spark):
    base = _edges(spark, [(1, 2, 5), (3, 4, 1)])
    got = as_map(remove_edges(base, _edges(spark, [(1, 2, 0)])))
    assert got == {(3, 4): 1}
    got2 = as_map(insert_if_absent(base, _edges(spark, [(1, 2, 99), (5, 6, 7)])))
    assert got2 == {(1, 2): 5, (3, 4): 1, (5, 6): 7}


def test_merge_rollup_equals_recompute(spark):
    """IVM law: folding the second half of events into the first
    half's rollup equals the one-shot rollup, bit-for-bit (COUNT and
    DECIMAL SUM are associative)."""
    from graphdb_testing_spark.datasets import load_table
    from graphdb_testing_spark.operators.updates import merge_rollup
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").localCheckpoint()
    mid = ev.agg(F.expr("percentile(event_id, 0.5)")).collect()[0][0]
    first, second = ev.filter(ev.event_id <= mid), ev.filter(ev.event_id > mid)

    def rollup(df):
        return df.groupBy(
            "event_type",
            F.date_trunc("hour", F.col("ts")).cast("long").alias("hour_epoch"),
        ).agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
        )

    merged = merge_rollup(rollup(first), second)
    want = {
        (r.event_type, r.hour_epoch): (r.n, r.sum_value)
        for r in rollup(ev).collect()
    }
    got = {
        (r.event_type, r.hour_epoch): (r.n, r.sum_value)
        for r in merged.collect()
    }
    assert got == want


def test_join_delta_equals_recompute(spark):
    """IVM delta rule: view ∪ Δ(A⋈B) == (A∪ΔA) ⋈ (B∪ΔB), bag
    semantics (duplicate keys on both sides)."""
    from graphdb_testing_spark.operators.ivm import join_delta

    a = spark.createDataFrame(
        [(1, "a1"), (1, "a2"), (2, "a3"), (5, "a4")], "k long, av string"
    )
    da = spark.createDataFrame([(2, "a5"), (3, "a6")], "k long, av string")
    b = spark.createDataFrame(
        [(1, "b1"), (2, "b2"), (2, "b3"), (4, "b4")], "k long, bv string"
    )
    db = spark.createDataFrame([(3, "b5"), (1, "b6")], "k long, bv string")

    old = a.join(b, ["k"])
    delta = join_delta(a, da, b, db, ["k"])
    new_inc = sorted(map(tuple, old.unionByName(delta).collect()))
    new_full = sorted(
        map(tuple, a.unionByName(da).join(b.unionByName(db), ["k"]).collect())
    )
    assert new_inc == new_full
    # the delta must contain the da⋈db cross term (k=3 appears only
    # in the deltas)
    assert any(r[0] == 3 for r in delta.collect())
