"""Unit tests: physmap (M8), timestamped merge + time filters (M6,
F5/F6), word-n-gram Jaccard dedup."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from graphdb_testing_spark.functions import dedup
from graphdb_testing_spark.operators import physmap
from graphdb_testing_spark.operators import updates as upd


def _ts(s):
    return datetime.datetime(2026, 1, 1, 0, 0, s)


def _us(s):
    return int(_ts(s).replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)


def test_physmap_dense_deterministic(spark):
    names = spark.createDataFrame(
        [("carol",), ("alice",), ("bob",), ("alice",)], "name string"
    )
    m = physmap.build_physmap(names).collect()
    assert {(r["name"], r["vid"]) for r in m} == {("alice", 0), ("bob", 1), ("carol", 2)}


def test_physmap_extend_keeps_existing_ids(spark):
    base = physmap.build_physmap(
        spark.createDataFrame([("alice",), ("bob",)], "name string")
    )
    ext = physmap.extend_physmap(
        base, spark.createDataFrame([("bob",), ("aaa",)], "name string")
    )
    got = {(r["name"], r["vid"]) for r in ext.collect()}
    assert got == {("alice", 0), ("bob", 1), ("aaa", 2)}


def test_physmap_lookup_roundtrip(spark):
    m = physmap.build_physmap(
        spark.createDataFrame([("x",), ("y",)], "name string")
    )
    ids = physmap.lookup(m, spark.createDataFrame([("y",), ("zz",)], "name string"))
    assert [(r["name"], r["vid"]) for r in ids.collect()] == [("y", 1)]
    back = physmap.reverse_lookup(m, spark.createDataFrame([(0,)], "vid long"))
    assert back.collect()[0]["name"] == "x"


def _actions(spark, rows):
    """rows: (seq, src, dst, weight, ts_second)."""
    return spark.createDataFrame(
        [(s, a, b, w, _ts(t)) for s, a, b, w, t in rows],
        "seq long, src long, dst long, weight long, ts timestamp",
    )


def test_timed_merge_tracks_first_and_recent(spark):
    acts = _actions(spark, [(1, 1, 2, 5, 10), (2, 1, 2, 3, 20)])
    out = upd.apply_actions_timed(None, acts).collect()
    by_key = {(r["src"], r["dst"]): r for r in out}
    r = by_key[(1, 2)]
    assert r["wgt"] == 8
    assert r["time_first"] == _us(10) and r["time_recent"] == _us(20)
    # symmetric direction identical
    assert by_key[(2, 1)]["wgt"] == 8


def test_timed_merge_delete_resets_time_first(spark):
    acts = _actions(
        spark,
        [(1, 1, 2, 5, 10), (2, -2, -3, 1, 20), (3, 1, 2, 7, 30)],
    )
    out = upd.apply_actions_timed(None, acts).collect()
    r = {(x["src"], x["dst"]): x for x in out}[(1, 2)]
    assert r["wgt"] == 7
    assert r["time_first"] == _us(30) and r["time_recent"] == _us(30)


def test_timed_merge_into_existing_edges(spark):
    edges = spark.createDataFrame(
        [(1, 2, 10, _us(1), _us(1)), (8, 9, 1, _us(2), _us(2))],
        "src long, dst long, wgt long, time_first long, time_recent long",
    )
    acts = _actions(spark, [(1, 1, 2, 5, 50)])
    out = upd.apply_actions_timed(edges, acts)
    r = {(x["src"], x["dst"]): x for x in out.collect()}
    assert r[(1, 2)]["wgt"] == 15
    assert r[(1, 2)]["time_first"] == _us(1)  # creation time preserved
    assert r[(1, 2)]["time_recent"] == _us(50)
    assert r[(8, 9)]["wgt"] == 1  # untouched edge intact
    assert {(x["src"], x["dst"]) for x in out.collect()} == {(1, 2), (2, 1), (8, 9)}


def test_modified_after_created_before(spark):
    edges = spark.createDataFrame(
        [(1, 2, 1, _us(1), _us(9)), (3, 4, 1, _us(5), _us(5))],
        "src long, dst long, wgt long, time_first long, time_recent long",
    )
    assert upd.modified_after(edges, _us(6)).count() == 1
    assert upd.created_before(edges, _us(3)).count() == 1


def test_ngram_jaccard_finds_near_dups(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy cat today"),
            (3, "completely different text with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    out = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3, max_df=10).collect()
    assert [(r["a_id"], r["b_id"]) for r in out] == [(1, 2)]
    assert 0.3 <= out[0]["jaccard"] <= 1.0


def test_ngram_jaccard_rare_blocking_drops_common_only_pairs(spark):
    # docs share only an n-gram that appears in > max_df documents
    common = "alpha beta gamma"
    docs = spark.createDataFrame(
        [(i, f"{common} unique{i} filler{i} tail{i}") for i in range(8)],
        "doc_id long, text string",
    )
    out = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.01, max_df=2)
    assert out.count() == 0


def test_range_prefix_sum_matches_global_window(spark):
    """Two-level range-partitioned exclusive scan == the single-task
    global-window scan it replaces (operators/prefix.py)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from graphdb_testing_spark.operators.prefix import range_prefix_sum

    rng = random.Random(11)
    ids = rng.sample(range(10_000), 400)
    df = spark.createDataFrame(
        [(i, rng.randint(1, 9)) for i in ids], "id long, degree long"
    )
    got = {
        r.id: r.off
        for r in range_prefix_sum(df, "id", "degree", num_partitions=7).collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r.id: r.off
        for r in df.select(
            "id", F.coalesce(F.sum("degree").over(w), F.lit(0)).alias("off")
        ).collect()
    }
    assert got == want


def test_write_graph_file_refuses_oversized_collect(spark, tmp_path, monkeypatch):
    from graphdb_testing_spark.sources import csr

    monkeypatch.setattr(csr, "MAX_DRIVER_EXPORT_ROWS", 3)
    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 0, 1), (1, 2, 1), (2, 1, 1)], "src long, dst long, wgt long"
    )
    with pytest.raises(ValueError, match="driver-side collect"):
        csr.write_graph_file(edges, str(tmp_path / "g.g"))


def test_typed_vertices_dominant_type_deterministic(spark):
    """vtype = dense rank of the user's dominant event type, ties to
    the alphabetically first — verified on a hand-built event set."""
    import pandas as pd

    from graphdb_testing_spark import datasets

    sf = "/root/testdata/sf0.001"
    verts = datasets.typed_vertices(spark, sf)
    got = {r.id: r.vtype for r in verts.collect()}
    # independent pandas recomputation over the same parquet
    ev = pd.read_parquet(f"{sf}/events.parquet")[["user_id", "event_type"]]
    tmap = {t: i for i, t in enumerate(sorted(ev["event_type"].unique()))}
    counts = (
        ev.groupby(["user_id", "event_type"]).size().reset_index(name="n")
    )
    counts = counts.sort_values(
        ["user_id", "n", "event_type"], ascending=[True, False, True]
    )
    dom = counts.groupby("user_id").first().reset_index()
    want = {
        int(r.user_id): tmap[r.event_type] for r in dom.itertuples()
    }
    assert got == want
    # every user appears exactly once
    assert verts.count() == verts.select("id").distinct().count()
