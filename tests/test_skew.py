"""Salted join / aggregation must be result-identical to the plain
formulations on skewed data (one hot key dominating)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_testing_spark.operators.skew import salted_aggregate, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key 7 carries 2000 rows; 50 cold keys carry 10 each
    hot = spark.range(2000).select(
        F.lit(7).alias("k"), (F.col("id") * 3).alias("v")
    )
    cold = spark.range(500).select(
        (F.col("id") % 50 + 100).alias("k"), F.col("id").alias("v")
    )
    return hot.unionAll(cold)


@pytest.fixture(scope="module")
def dim(spark):
    # keys 0..99: hot key 7 matches, the cold keys 100-149 do not
    return spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )


def _counts(df):
    from collections import Counter

    return Counter(tuple(r) for r in df.collect())


def test_salted_inner_join_identical(spark, skewed, dim):
    plain = skewed.join(dim, ["k"])
    salted = salted_join(skewed, dim, ["k"], n_salts=8)
    assert _counts(salted.select("k", "v", "name")) == _counts(
        plain.select("k", "v", "name")
    )


def test_salted_left_join_identical(spark, skewed, dim):
    plain = skewed.join(dim, ["k"], "left")
    salted = salted_join(skewed, dim, ["k"], n_salts=8, how="left")
    assert _counts(salted.select("k", "v", "name")) == _counts(
        plain.select("k", "v", "name")
    )
    # cold keys 100-149 have no dim match and must survive exactly once
    assert salted.filter(F.col("name").isNull()).count() == 500


def test_salted_join_rejects_right_preserving(spark, skewed, dim):
    with pytest.raises(ValueError):
        salted_join(skewed, dim, ["k"], how="right")


def test_salted_aggregate_identical(spark, skewed):
    plain = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in skewed.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in salted_aggregate(
            skewed,
            ["k"],
            [("v", "count", "n"), ("v", "sum", "s"), ("v", "min", "mn"), ("v", "max", "mx")],
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_aggregate_rejects_nondecomposable(spark, skewed):
    with pytest.raises(ValueError):
        salted_aggregate(skewed, ["k"], [("v", "avg", "a")])


def test_approx_sketches_track_exact(spark):
    """The documented 100 TB swap-ins (HLL count-distinct, t-digest
    percentile) stay within sketch tolerance of the exact aggregates
    they replace."""
    from graphdb_testing_spark.datasets import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact_d"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_d"),
        F.expr("percentile(CAST(value AS DOUBLE), 0.9)").alias("exact_p90"),
        F.expr("approx_percentile(CAST(value AS DOUBLE), 0.9, 1000)").alias(
            "approx_p90"
        ),
    ).collect()[0]
    assert abs(row.approx_d - row.exact_d) <= 0.05 * row.exact_d
    assert abs(row.approx_p90 - row.exact_p90) <= 0.05 * abs(row.exact_p90)
