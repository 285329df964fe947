"""Scale-safety tests for the distributed ranking idioms (round-3
verdict item 1): parity of the ``operators/prefix`` two-level
rank/ntile/lag helpers against Spark's window functions, plus plan
assertions proving the rewritten queries never plan a single-task
global sort over an O(n) input — top-k sites plan
TakeOrderedAndProject, exact-rank sites only ever run unpartitioned
windows over the per-partition bases table (ordered by ``_pid``).
"""

import io
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from graphdb_testing_spark.operators.prefix import (
    range_lag,
    range_ntile,
    range_prefix_sum,
    range_row_number,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skewed(spark):
    # duplicate-heavy values force ties to straddle range boundaries
    rows = [(i, (i * 7919) % 97) for i in range(4001)]
    return spark.createDataFrame(rows, "id long, v long").localCheckpoint()


def _same(a, b):
    return a.subtract(b).count() == 0 and b.subtract(a).count() == 0


def test_range_row_number_matches_window(skewed):
    got = range_row_number(skewed, [F.col("v"), F.col("id")], "rnk")
    exp = skewed.withColumn(
        "rnk", F.row_number().over(Window.orderBy("v", "id")).cast("long")
    )
    assert _same(got, exp)


def test_range_row_number_desc(skewed):
    got = range_row_number(skewed, [F.desc("v"), F.col("id")], "rnk")
    exp = skewed.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.desc("v"), "id")).cast("long"),
    )
    assert _same(got, exp)


@pytest.mark.parametrize("k", [3, 4, 7, 10, 5000])
def test_range_ntile_matches_window(skewed, k):
    got = range_ntile(skewed, [F.col("v"), F.col("id")], k, "b")
    exp = skewed.withColumn("b", F.ntile(k).over(Window.orderBy("v", "id")))
    assert _same(got, exp)


def test_range_lag_matches_window(skewed):
    got = range_lag(skewed, [F.col("v"), F.col("id")], "v", "prev")
    exp = skewed.withColumn("prev", F.lag("v").over(Window.orderBy("v", "id")))
    assert _same(got, exp)


def test_range_prefix_sum_multicol_desc(skewed):
    got = range_prefix_sum(skewed, [F.desc("v"), F.col("id")], "v", "off")
    w = Window.orderBy(F.desc("v"), "id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    exp = skewed.withColumn(
        "off", F.coalesce(F.sum("v").over(w), F.lit(0)).cast("long")
    )
    assert _same(got, exp)


# ---------------------------------------------------------------------------
# plan assertions
# ---------------------------------------------------------------------------


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# every windowspecdefinition must either be partitioned (first arg a
# bare column with no ASC/DESC sort direction) or, if unpartitioned,
# order ONLY by _pid — the one-row-per-partition bases/boundary table
_UNPARTITIONED = re.compile(r"windowspecdefinition\((\w+)#\d+L? (ASC|DESC)")


def _assert_no_global_sort_windows(plan: str):
    for m in _UNPARTITIONED.finditer(plan):
        assert m.group(1) == "_pid", (
            f"unpartitioned window over column {m.group(1)} — single-task "
            f"global sort:\n{plan}"
        )


def test_helper_plans_have_no_global_sort(skewed):
    for df in (
        range_row_number(skewed, [F.col("v"), F.col("id")], "rnk"),
        range_ntile(skewed, [F.col("v"), F.col("id")], 4, "b"),
        range_prefix_sum(skewed, "id", "v", "off"),
    ):
        _assert_no_global_sort_windows(_plan(df))
    # range_lag's boundary-patch lag IS over _pid, allowed by the rule
    _assert_no_global_sort_windows(
        _plan(range_lag(skewed, [F.col("id")], "v", "prev"))
    )


# exact-rank queries: no unpartitioned window except over _pid
_EXACT_RANK_QUERIES = [
    "order_percentiles",
    "quality_deciles",
    "orderkey_gap_audit",
    "range_split_points",
    "rfm_segments",
    "revenue_gini",
    "abc_revenue_classes",
    "peak_concurrency",
    # round-6: the shard planner's global token ranking (the one stage
    # every byte of a 100 TB corpus passes through) must never plan an
    # Exchange SinglePartition sort — verdict r5 finding 1
    "shard_plan_balanced",
    # round-7: CCNet terciles rank within-language via the global
    # range shuffle + broadcast bases, never a per-language window
    # (|languages| partitions = skew)
    "ccnet_perplexity_buckets",
    # round-8: concat-and-chunk packing offsets come from the range
    # prefix sum — the oracle's SUM() OVER (ORDER BY) single-partition
    # window is exactly what the Spark plan must not contain
    "sequence_packing_plan",
]

# top-k queries: the O(n) ordering must be TakeOrderedAndProject (the
# k-row rank window above it may legitimately be unpartitioned)
_TOPK_QUERIES = [
    "strongest_edges_named",
    "top_orders_by_revenue",
    # cms_heavy_hitters localCheckpoints its top-k (reused twice), so
    # the TakeOrderedAndProject is hidden behind the checkpoint —
    # covered by its oracle row instead
    "q10_returned_items",
    "activity_churn",
    "co_returned_parts",
]


@pytest.mark.parametrize("name", _EXACT_RANK_QUERIES)
def test_exact_rank_query_plans(spark, name):
    import __spark_entry__  # noqa: F401  (registers all query modules)

    from graphdb_testing_spark.queries import all_queries

    df = all_queries()[name](spark, SF)
    _assert_no_global_sort_windows(_plan(df))


@pytest.mark.parametrize("name", _TOPK_QUERIES)
def test_topk_query_plans(spark, name):
    import __spark_entry__  # noqa: F401  (registers all query modules)

    from graphdb_testing_spark.queries import all_queries

    df = all_queries()[name](spark, SF)
    assert "TakeOrderedAndProject" in _plan(df), name


def test_helpers_on_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "id long, v long")
    one = spark.createDataFrame([(7, 3)], "id long, v long")
    assert range_row_number(empty, [F.col("id")], "r").count() == 0
    assert range_ntile(empty, [F.col("id")], 4, "b").count() == 0
    assert range_lag(empty, [F.col("id")], "v", "p").count() == 0
    r = range_row_number(one, [F.col("id")], "r").collect()[0]
    assert (r.id, r.r) == (7, 1)
    b = range_ntile(one, [F.col("id")], 4, "b").collect()[0]
    assert b.b == 1
    p = range_lag(one, [F.col("id")], "v", "p").collect()[0]
    assert p.p is None


def test_range_ntile_k1(skewed):
    got = range_ntile(skewed, [F.col("v"), F.col("id")], 1, "b")
    assert got.filter(F.col("b") != 1).count() == 0


def test_set_similarity_verify_is_merge_shaped(spark):
    """The exact set-similarity verification must be the PPJoin merge
    shape (array_intersect on the pair row), never the old
    join-per-item explode + pair-keyed aggregate — the round-7 rewrite
    that cut the verify stage's shuffle from Σ|pair|·|set| rows to
    |pairs|."""
    from graphdb_testing_spark.functions.dedup import _verify_intersections

    items = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "c")], "doc_id long, item string"
    )
    cands = spark.createDataFrame([(1, 2)], "a_id long, b_id long")
    df = _verify_intersections(cands, items, "item")
    plan = _plan(df)
    assert "array_intersect" in plan, plan
    # no aggregate keyed on the candidate pair (the old verify shape)
    import re

    assert not re.search(r"HashAggregate\(keys=\[a_id\S*, b_id", plan), plan
    out = {(r.a_id, r.b_id): r.inter for r in df.collect()}
    assert out == {(1, 2): 1}
