"""Sources: binary .g/.a round-trips (FIXTURES.md §4), RMAT generator
invariants, CSV mapping + physmap, save/restore, sinks."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphdb_testing_spark.graph import Graph
from graphdb_testing_spark.operators.updates import decode_actions
from graphdb_testing_spark.sources import csr, csv_source, rmat, sinks


def test_graph_file_roundtrip(spark, tmp_path):
    g = rmat.rmat_graph(spark, scale=6, edge_factor=4, seed=3)
    path = str(tmp_path / "g.6.4.bin")
    nv, ne = csr.write_graph_file(g, path)
    # header invariants (reference stinger_consistency_check style)
    raw = np.fromfile(path, dtype="<u8")
    assert raw[0] == csr.ENDIAN_CHECK
    assert raw[1] == nv and raw[2] == ne
    off = raw[3 : 3 + nv + 1]
    assert off[-1] == ne  # off[nv] == ne
    back = csr.read_graph_file(spark, path)
    assert back.count() == g.count()
    orig = {(r.src, r.dst): r.wgt for r in g.collect()}
    got = {(r.src, r.dst): r.wgt for r in back.collect()}
    assert orig == got


def test_graph_file_byteswap_fallback(spark, tmp_path):
    g = rmat.rmat_graph(spark, scale=4, edge_factor=2, seed=5)
    path = str(tmp_path / "little.bin")
    csr.write_graph_file(g, path)
    swapped = str(tmp_path / "big.bin")
    np.fromfile(path, dtype="<u8").byteswap().tofile(swapped)
    back = csr.read_graph_file(spark, swapped)
    assert back.count() == g.count()


def test_actions_file_roundtrip(spark, tmp_path):
    acts = rmat.rmat_actions(spark, scale=6, num_actions=500, seed=11)
    path = str(tmp_path / "a.bin")
    n = csr.write_actions_file(acts, path)
    assert n == 500
    back = csr.read_actions_file(spark, path)
    assert back.count() == 500
    orig = [(r.src, r.dst) for r in acts.orderBy("seq").collect()]
    got = [(r.src, r.dst) for r in back.orderBy("seq").collect()]
    assert orig == got


def test_rmat_graph_invariants(spark):
    g = rmat.rmat_graph(spark, scale=7, edge_factor=4, seed=2)
    checks = Graph(edges=g).consistency_check()
    assert all(checks.values()), checks
    assert g.agg(F.max("src")).collect()[0][0] < 2**7
    # deterministic across invocations
    again = rmat.rmat_graph(spark, scale=7, edge_factor=4, seed=2)
    assert g.exceptAll(again).count() == 0 and again.exceptAll(g).count() == 0
    # different seed -> different graph
    other = rmat.rmat_graph(spark, scale=7, edge_factor=4, seed=3)
    assert g.exceptAll(other).count() > 0


def test_rmat_skew(spark):
    # RMAT concentrates mass in low quadrants: vertex 0's degree far
    # above the mean (A=0.55 repeated pulls toward low ids)
    g = rmat.rmat_graph(spark, scale=8, edge_factor=8, seed=1)
    degs = Graph(edges=g).out_degrees()
    mean = degs.agg(F.avg("degree")).collect()[0][0]
    top = degs.agg(F.max("degree")).collect()[0][0]
    assert top > 4 * mean


def test_rmat_actions_encoding(spark):
    acts = rmat.rmat_actions(spark, scale=6, num_actions=2000, seed=1)
    dec = decode_actions(acts)
    frac_del = dec.filter("is_delete").count() / 2000
    assert 0.03 < frac_del < 0.10  # P(delete) = 1/16
    assert dec.filter("src < 0 or dst < 0").count() == 0
    assert dec.filter(f"src >= {2**6} or dst >= {2**6}").count() == 0


def test_csv_mapping_and_physmap(spark, tmp_path):
    p = tmp_path / "edges.csv"
    p.write_text(
        "from,to,w,t\nalice,bob,3,100\nbob,carol,1,200\nalice,carol,2,150\n"
    )
    edges = csv_source.read_csv_edges(
        spark,
        str(p),
        mapping={"src": "from", "dst": "to", "weight": "w", "time": "t"},
        schema="from string, to string, w int, t long",
    )
    names = edges.select("src").unionAll(edges.select(F.col("dst").alias("src")))
    pm = csv_source.build_physmap(names, compact=True)
    ids = {r.name: r.id for r in pm.collect()}
    assert ids == {"alice": 0, "bob": 1, "carol": 2}
    resolved = csv_source.resolve_names(edges, pm)
    got = {(r.src, r.dst): (r.wgt, r.time_recent) for r in resolved.collect()}
    assert got[(0, 1)] == (3, 100) and got[(1, 2)] == (1, 200)


def test_physmap_hash_ids_deterministic(spark):
    names = spark.createDataFrame([("x",), ("y",)], "name string")
    a = {r.name: r.id for r in csv_source.build_physmap(names).collect()}
    b = {r.name: r.id for r in csv_source.build_physmap(names).collect()}
    assert a == b and len(set(a.values())) == 2


def test_save_restore(spark, tmp_path, path_graph):
    d = str(tmp_path / "ckpt")
    csr.save_graph(path_graph, d)
    back = csr.restore_graph(spark, d)
    assert {(r.src, r.dst, r.wgt) for r in back.collect()} == {
        (r.src, r.dst, r.wgt) for r in path_graph.collect()
    }


def test_histogram_and_result_store(spark, tmp_path, path_graph):
    degs = Graph(edges=path_graph).out_degrees()
    h = {r.value: r["count"] for r in sinks.histogram(degs, "degree").collect()}
    assert h == {1: 4, 2: 3}
    store = sinks.NamedResultStore()
    store.publish("degree", degs)
    assert store.names() == ["degree"]
    assert spark.sql("select count(*) from result_degree").collect()[0][0] == 7
    store.dump(str(tmp_path), batch=0)
    assert spark.read.parquet(str(tmp_path / "degree.0.parquet")).count() == 7


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    import io
    import re
    from contextlib import redirect_stdout

    from graphdb_testing_spark.sources.bucketed import (
        drop_bucketed,
        load_bucketed,
        save_edges_bucketed,
    )

    # managed table in the default warehouse (static conf can't move
    # per-test); DROP TABLE below removes the files
    edges = spark.createDataFrame(
        [(i % 50, (i * 7) % 50, 1) for i in range(500)],
        "src long, dst long, wgt long",
    )
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle path: with broadcast allowed the small test
        # table would be broadcast and the bucket co-location untested
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        save_edges_bucketed(edges, "e_bucketed", buckets=4)
        t = load_bucketed(spark, "e_bucketed")
        # self-join on the bucket key: both sides read co-located
        joined = t.alias("a").join(t.alias("b"), "src")
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        tree = buf.getvalue().split("\n\n")[0]
        assert "Exchange" not in tree, tree
        assert re.search(r"SelectedBucketsCount|Bucketed: true", buf.getvalue())
        # values round-trip
        assert t.count() == 500
        got = joined.count()
        from pyspark.sql import functions as F

        per_src = edges.groupBy("src").agg(F.count("*").alias("n"))
        expect = per_src.select(F.sum(F.col("n") * F.col("n"))).collect()[0][0]
        assert got == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        drop_bucketed(spark, "e_bucketed")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-partitioned parquet layout: a filter on the partition
    column must show up as PartitionFilters (directory pruning, zero
    I/O on other partitions), not a post-scan filter."""
    import io
    from contextlib import redirect_stdout

    df = spark.createDataFrame(
        [(i, i % 7, float(i)) for i in range(700)],
        "id long, day int, v double",
    )
    path = str(tmp_path / "events_by_day")
    df.write.partitionBy("day").parquet(path)

    rd = spark.read.parquet(path).filter("day = 3").select("id", "v")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rd.explain("formatted")
    txt = buf.getvalue()
    assert "PartitionFilters" in txt
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", txt)
    assert m and "day" in m.group(1), txt
    assert rd.count() == 100
    # wrote one directory per partition value
    import os

    assert sorted(
        d for d in os.listdir(path) if d.startswith("day=")
    ) == [f"day={i}" for i in range(7)]


def test_orc_roundtrip_preserves_schema_and_values(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5, [1, 2]), (2, "b", -0.5, [])],
        "id long, s string, v double, xs array<long>",
    )
    p = str(tmp_path / "orc_t")
    df.write.orc(p)
    back = spark.read.orc(p)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_jsonl_source_with_schema(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "tags": ["x"]}\n'
        '{"doc_id": 2, "text": null, "tags": []}\n'
        '{"doc_id": 3, "text": "third", "tags": ["a", "b"]}\n'
    )
    df = spark.read.schema("doc_id long, text string, tags array<string>").json(
        str(p)
    )
    rows = {r["doc_id"]: (r["text"], list(r["tags"])) for r in df.collect()}
    assert rows == {1: ("hello world", ["x"]), 2: (None, []), 3: ("third", ["a", "b"])}


def test_parquet_merge_schema_evolution(spark, tmp_path):
    """Schema evolution: a column added later must surface (null for
    old files) under mergeSchema — the lakehouse append pattern."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, s string").write.parquet(
        p + "/batch=0"
    )
    spark.createDataFrame(
        [(2, "b", 9.0)], "id long, s string, score double"
    ).write.parquet(p + "/batch=1")
    df = spark.read.option("mergeSchema", "true").parquet(p)
    rows = {r["id"]: (r["s"], r["score"]) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.0)}


def test_dynamic_partition_pruning_in_plan(spark, tmp_path):
    """A join whose dimension filter restricts fact partitions should
    plan a dynamicpruning subquery on the fact scan (DPP) — at 100 TB
    this is the difference between scanning 3 days and 3 years."""
    import io
    from contextlib import redirect_stdout

    fact = spark.createDataFrame(
        [(i, i % 20, float(i)) for i in range(2000)], "id long, day int, v double"
    )
    fp = str(tmp_path / "fact_by_day")
    fact.write.partitionBy("day").parquet(fp)
    dim = spark.createDataFrame(
        [(d, "keep" if d < 3 else "drop") for d in range(20)], "day int, tag string"
    )
    f = spark.read.parquet(fp)
    j = f.join(dim.filter("tag = 'keep'"), "day")
    buf = io.StringIO()
    with redirect_stdout(buf):
        j.explain("formatted")
    txt = buf.getvalue().lower()
    assert "dynamicpruning" in txt, txt
    assert j.count() == 300


def test_csrg_datasource_matches_driver_reader(spark, tmp_path):
    """The partitioned Python DataSource must produce exactly the
    edge set of the driver-side reader, across multiple partitions
    and under the byteswap fallback."""
    from graphdb_testing_spark.sources.csr import (
        read_graph_file,
        write_graph_file,
    )
    from graphdb_testing_spark.sources.csr_datasource import (
        read_graph_file_distributed,
    )

    edges = spark.createDataFrame(
        [(i % 40, (i * 13) % 40, 1 + i % 5) for i in range(400)],
        "src long, dst long, wgt long",
    ).distinct()
    p = str(tmp_path / "g1.g")
    write_graph_file(edges, p)

    want = sorted(map(tuple, read_graph_file(spark, p).collect()))
    for parts in (1, 3, 8):
        got_df = read_graph_file_distributed(spark, p, partitions=parts)
        assert got_df.rdd.getNumPartitions() >= 1
        got = sorted(map(tuple, got_df.collect()))
        assert got == want, f"partitions={parts}"

    # byteswapped file exercises the snarf fallback
    import numpy as np

    raw = np.fromfile(p, dtype="<u8")
    ps = str(tmp_path / "g1_swapped.g")
    raw.byteswap().tofile(ps)
    got = sorted(
        map(tuple, read_graph_file_distributed(spark, ps, partitions=4).collect())
    )
    assert got == want


def test_csrg_reader_chunks_bounded_batches(spark, tmp_path):
    """The partition reader streams its byte range through bounded
    Arrow batches (ADVICE r2) — force a tiny batch size (an option, so
    it reaches the pickled executor-side reader) so every partition
    needs several, and verify the edge set is unchanged and chunk
    boundaries mid-vertex expand src runs correctly."""
    from graphdb_testing_spark.sources.csr import (
        read_graph_file,
        write_graph_file,
    )
    from graphdb_testing_spark.sources import csr_datasource as cds

    edges = spark.createDataFrame(
        # skewed degrees: vertex 0 owns a long run that will straddle
        # several 64-edge chunks
        [(0, d, 1) for d in range(1, 200)]
        + [(i % 37, (i * 17) % 37, 1 + i % 3) for i in range(300)],
        "src long, dst long, wgt long",
    ).distinct()
    p = str(tmp_path / "gchunk.g")
    write_graph_file(edges, p)
    want = sorted(map(tuple, read_graph_file(spark, p).collect()))

    for be in (64, 1):  # several chunks / one edge per chunk
        got_df = cds.read_graph_file_distributed(
            spark, p, partitions=3, batch_edges=be
        )
        got = sorted(map(tuple, got_df.collect()))
        assert got == want, f"batch_edges={be}"


def test_distributed_g_writer_byte_identical(spark, tmp_path):
    """The parallel section writer must produce a byte-identical .g
    file to the driver-side writer, across partition counts, with
    zero-degree vertices (holes in the id space) and skewed degrees —
    and roundtrip through both readers."""
    from graphdb_testing_spark.sources.csr import (
        read_graph_file,
        write_graph_file,
    )
    from graphdb_testing_spark.sources.csr_datasource import (
        read_graph_file_distributed,
        write_graph_file_distributed,
    )

    edges = spark.createDataFrame(
        # hub vertex 0, holes at ids with no outgoing edges, tail ids
        [(0, d, d % 7 + 1) for d in range(1, 150)]
        + [(i * 3 % 101, (i * 41) % 101, 1 + i % 4) for i in range(400)],
        "src long, dst long, wgt long",
    ).distinct().filter("src != dst")

    p_ref = str(tmp_path / "ref.g")
    nv_ref, ne_ref = write_graph_file(edges, p_ref)
    for parts in (1, 3, 8):
        p_dist = str(tmp_path / f"dist{parts}.g")
        nv, ne = write_graph_file_distributed(edges, p_dist, partitions=parts)
        assert (nv, ne) == (nv_ref, ne_ref)
        assert open(p_dist, "rb").read() == open(p_ref, "rb").read(), (
            f"partitions={parts} not byte-identical"
        )
    # roundtrip through both readers
    want = sorted(map(tuple, edges.collect()))
    assert sorted(map(tuple, read_graph_file(spark, p_ref).collect())) == want
    got = read_graph_file_distributed(spark, str(tmp_path / "dist3.g"), partitions=4)
    assert sorted(map(tuple, got.collect())) == want


def test_csra_stream_source_replays_action_file(spark, tmp_path):
    """The csra streaming source must deliver exactly the file's
    (seq, src, dst) rows across multiple micro-batches."""
    from graphdb_testing_spark.sources.csr import (
        read_actions_file,
        write_actions_file,
    )
    from graphdb_testing_spark.sources.csr_datasource import action_stream

    acts = spark.createDataFrame(
        [(i, (i * 7) % 30, ~((i * 11) % 30) if i % 5 == 0 else (i * 11) % 30)
         for i in range(137)],
        "seq long, src long, dst long",
    )
    p = str(tmp_path / "acts.a")
    write_actions_file(acts, p)

    import time

    st = action_stream(spark, p, batch_size=40)
    q = (
        st.writeStream.format("memory")
        .queryName("t_csra")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    # the simple stream reader advances one batch per poll (40, 40,
    # 40, 17); wait until the sink has drained the file, then stop
    deadline = time.time() + 120
    while time.time() < deadline and spark.table("t_csra").count() < 137:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()
    got = sorted(map(tuple, spark.table("t_csra").collect()))
    want = sorted(
        map(tuple, read_actions_file(spark, p).select("seq", "src", "dst").collect())
    )
    assert got == want and len(got) == 137


def test_csv_roundtrip_quotes_newlines_nulls(spark, tmp_path):
    """CSV writer/reader must survive embedded quotes, commas,
    newlines, and nulls (multiLine read) without corrupting rows."""
    rows = [
        (1, 'plain', 1.5),
        (2, 'has,comma', -2.0),
        (3, 'has "quotes" inside', 0.0),
        (4, 'line\nbreak', 3.25),
        (5, None, None),
    ]
    df = spark.createDataFrame(rows, "id long, s string, v double")
    p = str(tmp_path / "csv_t")
    df.write.option("header", True).option("escape", '"').csv(p)
    back = (
        spark.read.option("header", True)
        .option("escape", '"')
        .option("multiLine", True)
        .schema("id long, s string, v double")
        .csv(p)
    )
    assert sorted(map(tuple, back.collect())) == sorted(rows, key=lambda r: r[0])


def test_cache_table_uses_in_memory_scan(spark, tmp_path):
    """cacheTable must turn subsequent scans into an in-memory relation scan
    (columnar cache) and preserve results exactly."""
    import io
    from contextlib import redirect_stdout

    df = spark.createDataFrame([(i, i % 7) for i in range(500)], "id long, k int")
    df.createOrReplaceTempView("cache_t")
    want = sorted(map(tuple, spark.table("cache_t").collect()))
    spark.catalog.cacheTable("cache_t")
    try:
        spark.table("cache_t").groupBy("k").count().collect()  # materialize
        # AQE-off explain of a FRESH plan (an executed DataFrame keeps
        # its adaptive plan, which summarizes cache reads as stages)
        prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            buf = io.StringIO()
            with redirect_stdout(buf):
                spark.table("cache_t").groupBy("k").count().explain("formatted")
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev)
        assert "InMemoryRelation" in buf.getvalue(), buf.getvalue()
        assert sorted(map(tuple, spark.table("cache_t").collect())) == want
    finally:
        spark.catalog.uncacheTable("cache_t")


def test_distributed_g_writer_empty_graph(spark, tmp_path):
    from graphdb_testing_spark.sources.csr import read_graph_file, write_graph_file
    from graphdb_testing_spark.sources.csr_datasource import (
        write_graph_file_distributed,
    )

    empty = spark.createDataFrame([], "src long, dst long, wgt long")
    p_ref = str(tmp_path / "e_ref.g")
    p_dist = str(tmp_path / "e_dist.g")
    assert write_graph_file(empty, p_ref) == (0, 0)
    assert write_graph_file_distributed(empty, p_dist) == (0, 0)
    assert open(p_dist, "rb").read() == open(p_ref, "rb").read()
    assert read_graph_file(spark, p_dist).count() == 0
