"""Deterministic-sketch tests: HLL accuracy, merge law, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_testing_spark.functions import sketches


def test_hll_estimate_accuracy(spark):
    """Raw HLL with m=64 has ~1.04/sqrt(64) = 13% standard error;
    assert the estimate lands within 3σ of a 5k-distinct truth."""
    n = 5000
    df = spark.range(n).select(
        F.lit("k").alias("key"), F.col("id").alias("v")
    )
    regs = sketches.hll_registers(df, ["key"], "v")
    est = sketches.hll_estimate(regs, ["key"]).collect()[0]["est_milli"] / 1000
    assert abs(est - n) / n < 0.40


def test_hll_merge_is_registerwise_max(spark):
    """Sketching two halves then max-merging registers equals
    sketching the union — the associativity law a distributed sink
    relies on."""
    a = spark.range(0, 3000).select(F.lit("k").alias("key"), F.col("id").alias("v"))
    b = spark.range(2000, 6000).select(
        F.lit("k").alias("key"), F.col("id").alias("v")
    )
    whole = sketches.hll_registers(a.unionAll(b), ["key"], "v")
    merged = (
        sketches.hll_registers(a, ["key"], "v")
        .unionAll(sketches.hll_registers(b, ["key"], "v"))
        .groupBy("key", "register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    e1 = sketches.hll_estimate(whole, ["key"]).collect()[0]["est_milli"]
    e2 = sketches.hll_estimate(merged, ["key"]).collect()[0]["est_milli"]
    assert e1 == e2


def test_hll_duplicates_do_not_move_estimate(spark):
    """Distinct counting: replicating every value 7× leaves the
    register state (and so the estimate) unchanged."""
    base = spark.range(1000).select(F.lit("k").alias("key"), F.col("id").alias("v"))
    dup = base.crossJoin(spark.range(7)).select("key", "v")
    e1 = sketches.hll_estimate(
        sketches.hll_registers(base, ["key"], "v"), ["key"]
    ).collect()[0]["est_milli"]
    e2 = sketches.hll_estimate(
        sketches.hll_registers(dup, ["key"], "v"), ["key"]
    ).collect()[0]["est_milli"]
    assert e1 == e2


def test_hll_intersection_estimate_sane(spark):
    """Inclusion-exclusion intersection estimate lands within the
    combined sketch error of the true overlap on controlled sets."""
    from pyspark.sql import functions as SF

    a = spark.range(0, 4000).select(SF.lit("a").alias("side"), SF.col("id").alias("v"))
    b = spark.range(2000, 6000).select(SF.lit("b").alias("side"), SF.col("id").alias("v"))
    regs = sketches.hll_registers(a.unionAll(b), ["side"], "v")
    est = {
        r.side: r.est_milli / 1000
        for r in sketches.hll_estimate(regs, ["side"]).collect()
    }
    union_regs = regs.groupBy("register").agg(
        F.max("max_rho").alias("max_rho")
    ).withColumn("k", F.lit(1))
    u = sketches.hll_estimate(union_regs, ["k"]).collect()[0]["est_milli"] / 1000
    inter_est = est["a"] + est["b"] - u
    # truth: |A∩B| = 2000; 3 sketches at ~13% sigma each
    assert abs(inter_est - 2000) < 2000 * 0.9


def test_table_digest_detects_single_row_change(spark, tmp_path):
    """Flipping ONE key column in ONE row must flip the XOR digest
    (and row counts stay equal — the case checksums exist for)."""
    import os

    import pyarrow.parquet as pq

    from graphdb_testing_spark.queries import all_queries
    import graphdb_testing_spark.queries_sketches  # noqa: F401

    sf = "/root/testdata/sf0.001"
    d = tmp_path / "mutated"
    d.mkdir()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"):
        os.symlink(f"{sf}/{t}.parquet", d / f"{t}.parquet")
    tbl = pq.read_table(f"{sf}/events.parquet").to_pandas()
    tbl.loc[0, "user_id"] = tbl.loc[0, "user_id"] + 1
    import pyarrow as pa

    pq.write_table(pa.Table.from_pandas(tbl), d / "events.parquet")
    q = all_queries()["table_digests"]
    base = {r.tbl: (r.n_rows, r.digest) for r in q(spark, sf).collect()}
    mut = {r.tbl: (r.n_rows, r.digest) for r in q(spark, str(d)).collect()}
    assert base["events"][0] == mut["events"][0]  # same row count
    assert base["events"][1] != mut["events"][1]  # digest flips
    assert base["orders"] == mut["orders"]  # untouched tables agree


def test_cms_overestimates_and_tightens_with_width(spark):
    from graphdb_testing_spark.functions.sketches import (
        cms_counters,
        cms_point_estimates,
    )

    rows = [(i % 10,) for i in range(1000)] + [(99,)] * 500
    df = spark.createDataFrame(rows, "item long")
    true = {r["item"]: r["cnt"] for r in df.groupBy("item").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("cnt")
    ).collect()}
    probes = df.select("item").distinct()
    for width, slack in [(64, 3000), (4096, 0)]:
        c = cms_counters(df, "item", depth=4, width=width)
        est = {
            r["item"]: r["cms_estimate"]
            for r in cms_point_estimates(c, probes, "item", depth=4, width=width).collect()
        }
        for it, t in true.items():
            assert est[it] >= t
            assert est[it] - t <= slack
        if width == 4096:
            # at 4096 counters for 11 items, collisions are essentially
            # impossible: estimates are exact
            assert est == true


def test_kmv_estimate_accuracy_and_merge(spark):
    """KMV estimate within ~3/sqrt(k) relative error on 5000 distinct
    items; merging two halves' bottom-k sets re-min'd equals the
    full-data sketch (union law)."""
    import pyspark.sql.functions as SF

    from graphdb_testing_spark.hashutil import hash_prefix

    df = spark.createDataFrame([(i % 5000,) for i in range(20000)], "u long")
    kh = df.select(
        hash_prefix(SF.concat_ws("|", SF.lit("kmv"), SF.col("u").cast("string")), 8).alias("h")
    ).distinct()
    hs = sorted(r["h"] for r in kh.collect())
    k = 256
    est = (k - 1) * 4294967296 // hs[k - 1]
    assert abs(est - 5000) / 5000 < 3.0 / (k ** 0.5)
    # union law: bottom-k of (bottom-k(first half) ∪ bottom-k(second)) ==
    # bottom-k of all
    h1 = sorted(r["h"] for r in df.filter("u < 2500").select(
        hash_prefix(SF.concat_ws("|", SF.lit("kmv"), SF.col("u").cast("string")), 8).alias("h")
    ).distinct().collect())[:k]
    h2 = sorted(r["h"] for r in df.filter("u >= 2500").select(
        hash_prefix(SF.concat_ws("|", SF.lit("kmv"), SF.col("u").cast("string")), 8).alias("h")
    ).distinct().collect())[:k]
    assert sorted(set(h1) | set(h2))[:k] == hs[:k]
