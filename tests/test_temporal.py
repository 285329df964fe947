"""Unit tests for the temporal operators (as-of join, range join)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from graphdb_testing_spark.operators.temporal import asof_join, range_join


def _ts(s: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", _ts(10), 1),
            ("A", _ts(20), 2),
            ("A", _ts(5), 3),  # before any quote
            ("B", _ts(10), 4),  # B has no quotes at all
        ],
        "sym string, ts timestamp, trade_id long",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts(8), 100.0),
            ("A", _ts(10), 101.0),  # equal-ts quote
            ("A", _ts(15), 102.0),
        ],
        "sym string, qts timestamp, px double",
    )
    return trades, quotes


def test_asof_backward_inclusive(spark):
    trades, quotes = _trades_quotes(spark)
    out = asof_join(
        trades, quotes, on=["sym"], left_time="ts", right_time="qts",
        value_cols=["px"],
    )
    got = {r.trade_id: r.px for r in out.collect()}
    # inclusive: trade at t=10 sees the t=10 quote
    assert got == {1: 101.0, 2: 102.0, 3: None, 4: None}


def test_asof_strict_excludes_equal_time(spark):
    trades, quotes = _trades_quotes(spark)
    out = asof_join(
        trades, quotes, on=["sym"], left_time="ts", right_time="qts",
        value_cols=["px"], strict=True,
    )
    got = {r.trade_id: r.px for r in out.collect()}
    assert got == {1: 100.0, 2: 102.0, 3: None, 4: None}


def test_asof_tolerance_nulls_stale_matches(spark):
    trades, quotes = _trades_quotes(spark)
    out = asof_join(
        trades, quotes, on=["sym"], left_time="ts", right_time="qts",
        value_cols=["px"], tolerance_us=2_000_000,
    )
    got = {r.trade_id: r.px for r in out.collect()}
    # trade 2 at t=20: nearest quote t=15 is 5s stale -> nulled
    assert got == {1: 101.0, 2: None, 3: None, 4: None}


def test_asof_preserves_left_rows_and_columns(spark):
    trades, quotes = _trades_quotes(spark)
    out = asof_join(
        trades, quotes, on=["sym"], left_time="ts", right_time="qts",
        value_cols=["px"],
    )
    assert out.columns == ["sym", "ts", "trade_id", "px"]
    assert out.count() == trades.count()


def test_asof_tiebreak_orders_equal_timestamps(spark):
    left = spark.createDataFrame(
        [("A", _ts(10), 5)], "k string, ts timestamp, lid long"
    )
    right = spark.createDataFrame(
        [("A", _ts(10), 3, 30.0), ("A", _ts(10), 7, 70.0)],
        "k string, ts timestamp, rid long, v double",
    )
    out = asof_join(
        left, right, on=["k"], left_time="ts", right_time="ts",
        value_cols=["rid", "v"], tiebreak=("lid", "rid"), strict=True,
    )
    row = out.collect()[0]
    # only rid=3 is strictly before (ts, lid=5); rid=7 sorts after
    assert row.rid == 3 and row.v == 30.0


def test_range_join_closed_interval(spark):
    pts = spark.createDataFrame(
        [("u", _ts(0), 1), ("u", _ts(60), 2), ("u", _ts(61), 3), ("v", _ts(30), 4)],
        "k string, ts timestamp, pid long",
    )
    iv = spark.createDataFrame(
        [("u", _ts(0), _ts(60), 10)],
        "k string, s timestamp, e timestamp, iid long",
    )
    out = range_join(
        pts, iv, on=["k"], point_time="ts", start="s", end="e",
        bucket_us=30_000_000,
    )
    got = sorted(r.pid for r in out.collect())
    assert got == [1, 2]  # closed [0s, 60s]; wrong key and t=61 excluded


def test_range_join_interval_spanning_many_buckets(spark):
    pts = spark.createDataFrame(
        [("u", _ts(s), s) for s in range(0, 500, 50)],
        "k string, ts timestamp, pid long",
    )
    iv = spark.createDataFrame(
        [("u", _ts(100), _ts(400), 1)],
        "k string, s timestamp, e timestamp, iid long",
    )
    out = range_join(
        pts, iv, on=["k"], point_time="ts", start="s", end="e",
        bucket_us=60_000_000,
    )
    got = sorted(r.pid for r in out.collect())
    assert got == [100, 150, 200, 250, 300, 350, 400]
    # no duplicate matches despite the interval covering ~6 buckets
    assert out.count() == out.dropDuplicates(["pid", "iid"]).count()


def test_scd2_collapses_runs_and_marks_current(spark):
    from graphdb_testing_spark.queries import all_queries  # noqa: F401
    import graphdb_testing_spark.queries_temporal  # noqa: F401

    rows = [
        (1, "2024-01-01 00:00:00", 10, "a", 0.0, "{}"),
        (2, "2024-01-01 01:00:00", 10, "a", 0.0, "{}"),  # same state: collapsed
        (3, "2024-01-01 02:00:00", 10, "b", 0.0, "{}"),
        (4, "2024-01-01 03:00:00", 10, "a", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    import tempfile, os

    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = all_queries()["user_state_history"](spark, d).orderBy("valid_from_us")
    hist = [(r.state, r.is_current) for r in out.collect()]
    assert hist == [("a", 0), ("b", 0), ("a", 1)]
    spans = out.collect()
    # intervals chain: each valid_to equals the next valid_from
    assert spans[0].valid_to_us == spans[1].valid_from_us
    assert spans[1].valid_to_us == spans[2].valid_from_us
