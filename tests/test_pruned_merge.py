"""Partition-pruned stored merge: apply_actions semantics against a
hash-partitioned parquet edge store, rewriting only touched
partitions (the lakehouse-merge answer to the reference's in-place
edge-block update, ``include/core/stinger-internal.h``)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from graphdb_testing_spark.operators.updates import (
    apply_actions,
    apply_actions_pruned,
    init_edge_store,
    read_edge_store,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, wgt long")


def _actions(spark, rows):
    return spark.createDataFrame(rows, "seq long, src long, dst long, weight long")


def as_map(df):
    return {(r.src, r.dst): r.wgt for r in df.collect()}


def _data_dir(path):
    """Resolve the live generation's data dir (commit-pointer layout)."""
    commits = os.path.join(path, "_commits")
    gen = max(int(n) for n in os.listdir(commits) if n.isdigit())
    return os.path.join(path, f"gen-{gen:06d}")


def _part_snapshot(path):
    """{pt-dir: sorted file names} for every partition directory of
    the live generation."""
    out = {}
    d0 = _data_dir(path)
    for d in os.listdir(d0):
        if d.startswith("pt="):
            out[d] = sorted(
                f for f in os.listdir(os.path.join(d0, d)) if f.endswith(".parquet")
            )
    return out


def test_pruned_merge_matches_full_merge(spark, tmp_path):
    """Parity: the stored pruned merge and the full-table merge agree
    bit-for-bit on a mixed insert/upsert/delete/reinsert batch."""
    base_rows = [
        (i, j, (i + j) % 7 + 1)
        for i in range(40)
        for j in range(40)
        if i != j and (i * 31 + j) % 11 == 0
    ]
    base = _edges(spark, base_rows)
    acts = _actions(
        spark,
        [
            (0, 1, 2, 3),  # insert/upsert
            (1, -2, -3, 1),  # delete (1, 2)
            (2, 1, 2, 5),  # re-insert after delete
            (3, 5, 9, 2),
            (4, -6, -10, 1),  # delete (5, 9) (kills the seq-3 insert)
            (5, 7, 7, 9),  # self-loop: skipped
            (6, 100, 200, 4),  # brand-new vertices
        ],
    )
    want = as_map(apply_actions(base, acts))

    path = str(tmp_path / "store")
    init_edge_store(base, path, n_parts=16)
    stats = apply_actions_pruned(spark, path, acts, n_parts=16)
    got = as_map(read_edge_store(spark, path))

    assert got == want
    assert 0 < stats["touched"] <= 16


def test_pruned_merge_rewrites_only_touched_partitions(spark, tmp_path):
    """A single-key batch must leave every untouched partition's files
    byte-identical (same file names — the write never opened them)."""
    base = _edges(spark, [(i, i + 1, 1) for i in range(0, 400, 2)])
    path = str(tmp_path / "store")
    n_parts = 32
    init_edge_store(base, path, n_parts=n_parts)
    before = _part_snapshot(path)

    acts = _actions(spark, [(0, 2, 3, 7)])  # one upsert ⇒ 2 directed keys
    stats = apply_actions_pruned(spark, path, acts, n_parts=n_parts)
    after = _part_snapshot(path)

    assert stats["touched"] <= 2
    # the touched dirs are exactly the hash partitions of the 2 keys
    touched_dirs = {
        f"pt={r['pt']}"
        for r in spark.createDataFrame(
            [(2, 3), (3, 2)], "src long, dst long"
        )
        .select(F.pmod(F.xxhash64("src", "dst"), F.lit(n_parts)).alias("pt"))
        .collect()
    }
    for d, files in before.items():
        if d not in touched_dirs:
            assert after[d] == files, f"untouched partition {d} was rewritten"
    # and the merge itself landed
    got = as_map(read_edge_store(spark, path))
    assert got[(2, 3)] == 8  # base 1 + upsert 7
    assert got[(3, 2)] == 7  # created by the reverse direction


def test_pruned_merge_drops_annihilated_partition(spark, tmp_path):
    """If a batch deletes every key in a partition, dynamic overwrite
    leaves the stale directory; the manifest diff must drop it."""
    # one lonely edge pair; fine partitioning so its partitions likely
    # hold nothing else — then delete it
    base = _edges(spark, [(1, 2, 5), (2, 1, 5)])
    path = str(tmp_path / "store")
    init_edge_store(base, path, n_parts=8)
    acts = _actions(spark, [(0, -2, -3, 1)])  # delete (1, 2)
    apply_actions_pruned(spark, path, acts, n_parts=8)
    got = read_edge_store(spark, path)
    assert got.count() == 0


def test_pruned_merge_empty_batch_is_noop(spark, tmp_path):
    base = _edges(spark, [(1, 2, 5), (2, 1, 5)])
    path = str(tmp_path / "store")
    init_edge_store(base, path, n_parts=8)
    before = _part_snapshot(path)
    acts = spark.createDataFrame([], "seq long, src long, dst long, weight long")
    stats = apply_actions_pruned(spark, path, acts, n_parts=8)
    assert stats["touched"] == 0
    assert _part_snapshot(path) == before


def test_broadcast_merge_matches_shuffle_merge(spark):
    """The broadcast-delta strategy is bit-identical to the full_outer
    strategy on a batch hitting every case: upsert existing, delete
    existing, delete-then-reinsert, new key, delete-nonexistent,
    self-loop."""
    base_rows = [
        (i, j, (i * 7 + j) % 5 + 1)
        for i in range(30)
        for j in range(30)
        if i != j and (i + j) % 4 == 0
    ]
    base = _edges(spark, base_rows)
    acts = _actions(
        spark,
        [
            (0, 1, 3, 2),
            (1, -2, -4, 1),
            (2, 1, 3, 9),
            (3, 500, 501, 6),
            (4, -501, -601, 1),  # delete a key that never existed
            (5, 6, 6, 1),  # self-loop skipped
            (6, 2, 6, 4),
        ],
    )
    want = as_map(apply_actions(base, acts))
    got = as_map(apply_actions(base, acts, broadcast_delta=True))
    assert got == want and len(got) > 0


def test_broadcast_merge_never_shuffles_the_table(spark):
    """Plan assertion: with broadcast_delta the edge table reaches the
    join through broadcast hash joins only — no Exchange (shuffle) or
    Sort feeds from the base scan side."""
    base = _edges(spark, [(i, i + 1, 1) for i in range(50)])
    acts = _actions(spark, [(0, 1, 2, 3), (1, 900, 901, 2)])
    out = apply_actions(base, acts, broadcast_delta=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pruned_scan_has_partition_filters(spark, tmp_path):
    """The base read must prune at the source: the scan node carries a
    partition filter on pt, so untouched directories are never read."""
    base = _edges(spark, [(i, i + 1, 1) for i in range(100)])
    path = str(tmp_path / "store")
    init_edge_store(base, path, n_parts=16)
    plan = (
        spark.read.parquet(_data_dir(path))
        .filter(F.col("pt").isin([1, 2]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "pt" in plan


# ---------------------------------------------------------------------------
# round-6: merge-regime auto-picker (the measured cost model as code)
# ---------------------------------------------------------------------------

from graphdb_testing_spark.operators.updates import (  # noqa: E402
    apply_actions_auto,
    merge_strategy,
)


def test_merge_strategy_reproduces_measured_crossover():
    """The picker must reproduce every row of the round-5 measured
    crossover table (BENCHMARKS.md): SCALE-22 store = 65.7M rows."""
    ne = 65_700_000
    # B=256: 10 actions touched 7.8% -> pruned won 3.4x
    assert merge_strategy(10, 256, ne) == "pruned"
    # B=256: 1k actions touched 99.6% -> rewrite won 7.8x
    assert merge_strategy(1_000, 256, ne) == "rewrite"
    # B=256: 100k actions -> rewrite won 11x
    assert merge_strategy(100_000, 256, ne) == "rewrite"
    # B=4096: 10 actions touched 0.5% -> pruned won 6.3x
    assert merge_strategy(10, 4096, ne) == "pruned"
    # B=4096: 1k actions touched 39% -> rewrite won 4.0x
    assert merge_strategy(1_000, 4096, ne) == "rewrite"
    # small table: fixed costs dominate, rewrite always (sf0.1 A/B)
    assert merge_strategy(10, 256, 590_000) == "rewrite"
    # network-bound bulk batch that fits a broadcast: never shuffle
    # the big table
    assert merge_strategy(1_000, 256, ne, network_bound=True) == (
        "broadcast_delta"
    )
    # network-bound but delta too big to broadcast: rewrite
    assert merge_strategy(10_000_000, 256, ne, network_bound=True) == (
        "rewrite"
    )


_MIXED_ACTIONS = [
    (0, 1, 2, 3),  # upsert existing
    (1, -2, -3, 1),  # delete (1, 2)
    (2, 1, 2, 5),  # re-insert after delete
    (3, 500, 501, 6),  # brand-new key
    (4, -501, -601, 1),  # delete a key that never existed
    (5, 6, 6, 1),  # self-loop skipped
]


def test_apply_actions_auto_parity_all_three_paths(spark, tmp_path):
    """All three dispatched physical paths agree bit-for-bit with the
    plain apply_actions reference on the same mixed batch."""
    base_rows = [
        (i, j, (i * 3 + j) % 5 + 1)
        for i in range(30)
        for j in range(30)
        if i != j and (i + j) % 4 == 0
    ]
    base = _edges(spark, base_rows)
    acts = _actions(spark, _MIXED_ACTIONS)
    want = as_map(apply_actions(base, acts))

    # rewrite via in-memory edges
    got, s = apply_actions_auto(spark, acts, edges=base, force="rewrite")
    assert s == "rewrite" and as_map(got) == want
    # broadcast-delta via in-memory edges
    got, s = apply_actions_auto(
        spark, acts, edges=base, force="broadcast_delta"
    )
    assert s == "broadcast_delta" and as_map(got) == want
    # pruned via a stored table
    path = str(tmp_path / "store")
    init_edge_store(base, path, n_parts=16)
    got, s = apply_actions_auto(
        spark, acts, store_path=path, n_parts=16, force="pruned"
    )
    assert s == "pruned" and as_map(got) == want


def test_apply_actions_auto_picks_and_runs_unforced(spark, tmp_path):
    """Unforced dispatch on a small table picks rewrite (measured:
    fixed costs dominate below 10M rows) and lands the right result —
    including rewriting a stored table back in place."""
    base = _edges(spark, [(1, 2, 5), (2, 1, 5), (3, 4, 1), (4, 3, 1)])
    acts = _actions(spark, [(0, 1, 2, 3)])
    want = as_map(apply_actions(base, acts))

    got, s = apply_actions_auto(spark, acts, edges=base)
    assert s == "rewrite" and as_map(got) == want

    path = str(tmp_path / "store")
    init_edge_store(base, path, n_parts=8)
    got, s = apply_actions_auto(spark, acts, store_path=path, n_parts=8)
    assert s == "rewrite" and as_map(got) == want
    # the store itself was rewritten in place
    assert as_map(read_edge_store(spark, path)) == want


def test_apply_actions_auto_arg_validation(spark):
    import pytest as _pytest

    acts = _actions(spark, [(0, 1, 2, 3)])
    base = _edges(spark, [(1, 2, 5)])
    with _pytest.raises(ValueError):
        apply_actions_auto(spark, acts)
    with _pytest.raises(ValueError):
        apply_actions_auto(spark, acts, edges=base, force="nope")


# ---------------------------------------------------------------------------
# round-7: crash-safe generation commits + derived partition count
# ---------------------------------------------------------------------------

from graphdb_testing_spark.operators.updates import (  # noqa: E402
    _commit_store,
    _gc_store,
    _write_generation,
    derive_n_parts,
    store_meta,
)


def test_rewrite_swap_survives_crash_before_commit(spark, tmp_path):
    """Crash simulation (VERDICT r6 finding 1): a rewrite that dies
    AFTER fully writing the next generation but BEFORE the commit
    record must leave the store reading as the OLD generation — the
    atomicity contract of the commit-pointer swap."""
    base = _edges(spark, [(1, 2, 5), (2, 1, 5), (3, 4, 1), (4, 3, 1)])
    path = str(tmp_path / "store")
    init_edge_store(base, path, n_parts=8)
    want_old = as_map(read_edge_store(spark, path))

    # the rewrite's first half: next generation fully on disk, no commit
    merged = _edges(spark, [(7, 8, 9), (8, 7, 9)])
    gen, gen_dir = _write_generation(merged, path, 8)
    assert os.path.isdir(gen_dir)  # data really was written
    # --- crash here: reader must still see the old generation ---
    assert as_map(read_edge_store(spark, path)) == want_old
    assert store_meta(spark, path)["gen"] == gen - 1

    # recovery: the next successful commit publishes and GCs the orphan
    acts = _actions(spark, [(0, 1, 2, 3)])
    got, s = apply_actions_auto(spark, acts, store_path=path, force="rewrite")
    assert as_map(got) == as_map(apply_actions(base, acts))
    gens = [d for d in os.listdir(path) if d.startswith("gen-")]
    assert len(gens) == 1  # old generation AND the orphan were GC'd


def test_rewrite_swap_crash_mid_data_write(spark, tmp_path):
    """A half-written generation directory (no commit record) is
    invisible garbage: readers resolve the old generation, and the
    next commit sweeps the partial dir."""
    base = _edges(spark, [(1, 2, 5), (2, 1, 5)])
    path = str(tmp_path / "store")
    init_edge_store(base, path, n_parts=8)
    want = as_map(read_edge_store(spark, path))
    # simulate a torn write: partial gen dir with junk, never committed
    os.makedirs(os.path.join(path, "gen-000002/pt=3"))
    with open(os.path.join(path, "gen-000002/pt=3/part-junk.parquet"), "wb") as f:
        f.write(b"not parquet")
    assert as_map(read_edge_store(spark, path)) == want
    got, s = apply_actions_auto(
        spark, _actions(spark, [(0, 9, 10, 1)]), store_path=path, force="rewrite"
    )
    # the next writer claims gen-2 with mode=overwrite, clobbering the
    # torn remains, and commits it — the junk cannot survive
    assert (9, 10) in as_map(read_edge_store(spark, path))
    assert store_meta(spark, path)["gen"] == 2
    assert not os.path.exists(os.path.join(path, "gen-000002/pt=3/part-junk.parquet"))
    assert len([d for d in os.listdir(path) if d.startswith("gen-")]) == 1


def test_commit_is_exclusive_and_gc_keeps_only_live_gen(spark, tmp_path):
    """Commit records are create-exclusive (a gen collision fails loud
    rather than clobbering history) and GC keeps exactly the live
    generation."""
    import pytest as _pytest

    base = _edges(spark, [(1, 2, 5), (2, 1, 5)])
    path = str(tmp_path / "store")
    init_edge_store(base, path, n_parts=8)
    with _pytest.raises(Exception):
        _commit_store(spark, path, 1, 8)  # gen 1 already committed
    # three rewrites -> exactly one gen dir and one commit record left
    for i in range(3):
        apply_actions_auto(
            spark,
            _actions(spark, [(0, 20 + i, 30 + i, 1)]),
            store_path=path,
            force="rewrite",
        )
    assert len([d for d in os.listdir(path) if d.startswith("gen-")]) == 1
    commits = [
        n for n in os.listdir(os.path.join(path, "_commits")) if n.isdigit()
    ]
    assert commits == ["4"]
    assert store_meta(spark, path)["gen"] == 4


def test_store_records_n_parts_and_rejects_mismatch(spark, tmp_path):
    """The committed n_parts is the single source of truth: merges
    resolve it without being told, and a contradicting explicit value
    is an error, not a corruption."""
    import pytest as _pytest

    base = _edges(spark, [(1, 2, 5), (2, 1, 5)])
    path = str(tmp_path / "store")
    init_edge_store(base, path, n_parts=8)
    acts = _actions(spark, [(0, 1, 2, 3)])
    # no n_parts passed: resolved from the commit record
    stats = apply_actions_pruned(spark, path, acts)
    assert stats["n_parts"] == 8
    with _pytest.raises(ValueError):
        apply_actions_pruned(spark, path, acts, n_parts=16)
    with _pytest.raises(ValueError):
        apply_actions_auto(spark, acts, store_path=path, n_parts=16)
    # a rewrite preserves the committed B
    apply_actions_auto(spark, acts, store_path=path, force="rewrite")
    assert store_meta(spark, path)["n_parts"] == 8


def test_derive_n_parts_sizing_rule():
    """262144-row target, power-of-two, clamped to [16, 2^20]; must
    reproduce the measured SCALE-24 configuration (265M rows -> 1024,
    ~259k rows/part, `PRUNED_AB_L24_r06.json`)."""
    assert derive_n_parts(265_000_000) == 1024
    assert derive_n_parts(65_700_000) == 256  # SCALE-22 store
    assert derive_n_parts(590_000) == 16  # sf0.1 store: floor
    assert derive_n_parts(0) == 16
    assert derive_n_parts(10**12) == 1 << 20  # cap
    # power of two and monotone non-decreasing
    prev = 0
    for rows in [1, 10**4, 10**6, 10**7, 10**8, 10**9, 10**10]:
        n = derive_n_parts(rows)
        assert n & (n - 1) == 0
        assert n >= prev
        prev = n


def test_init_edge_store_derives_n_parts_by_default(spark, tmp_path):
    base = _edges(spark, [(i, i + 1, 1) for i in range(100)])
    path = str(tmp_path / "store")
    used = init_edge_store(base, path)
    assert used == 16  # tiny table -> floor
    assert store_meta(spark, path)["n_parts"] == 16
    assert read_edge_store(spark, path).count() == 100


# ---------------------------------------------------------------------------
# round-8: trickle undo journal — crash-safe in-place partition overwrite
# (VERDICT r7 task 3; rollback-journal semantics per the reference's
# sqlite backend, tests/sqlite/test.c:341-360 — actions applied in
# both orientations, inserts and deletes)
# ---------------------------------------------------------------------------

import shutil as _shutil

from graphdb_testing_spark.operators.updates import (  # noqa: E402
    _write_trickle_journal,
    recover_trickle,
)


def _mk_torn_scenario(spark, tmp_path, name):
    """Build twin stores (same base, same batch: inserts AND deletes
    spanning several partitions), run the batch to completion on the
    twin, and return (crash_path, twin data for expectations)."""
    base_rows = [(i, i + 1, 5) for i in range(0, 40, 2)]
    base_rows += [(j, i, w) for i, j, w in base_rows]  # both orientations
    base = _edges(spark, base_rows)
    # inserts (seq,src,dst,w>0) and deletes (w=None encoded by the
    # action decoder via negative src per reference ~x convention) —
    # use the actions helper's plain form: positive = insert/incr
    acts_rows = [(0, 1, 2, 7), (1, 100, 101, 3), (2, ~4, ~5, 0), (3, ~5, ~4, 0)]
    acts = _actions(spark, acts_rows)

    crash, twin = str(tmp_path / f"{name}_crash"), str(tmp_path / f"{name}_twin")
    init_edge_store(base, crash, n_parts=8)
    init_edge_store(base, twin, n_parts=8)
    apply_actions_pruned(spark, twin, acts)  # uninterrupted run
    want = as_map(read_edge_store(spark, twin))
    # sanity: the batch really does change things in both orientations
    assert want != as_map(_edges(spark, base_rows))
    return crash, acts, want, as_map(_edges(spark, base_rows))


def test_trickle_crash_between_partition_overwrites(spark, tmp_path):
    """Kill AFTER some touched partitions carry the merged result and
    others are still stale (the dynamic-overwrite torn window):
    recovery must roll the store back to the pre-batch state and a
    replay of the same action batch from the log must converge to the
    uninterrupted run's content."""
    crash, acts, want, pre = _mk_torn_scenario(spark, tmp_path, "torn")
    d_crash = _data_dir(crash)

    # a second uninterrupted twin supplies per-partition MERGED bytes
    # (built BEFORE journaling crash — the writer path auto-recovers,
    # which would sweep a live journal)
    crash2 = str(tmp_path / "torn_twin2")
    init_edge_store(_edges(spark, [(k[0], k[1], w) for k, w in pre.items()]),
                    crash2, n_parts=8)
    apply_actions_pruned(spark, crash2, acts)

    # the real journal step (what the merge does first)
    from graphdb_testing_spark.operators.updates import batch_delta, both_directions, decode_actions, _store_pt

    delta = batch_delta(both_directions(decode_actions(acts))).withColumn(
        "pt", _store_pt(8)
    )
    touched = sorted(r["pt"] for r in delta.select("pt").distinct().collect())
    assert len(touched) >= 2, "scenario must tear across >= 2 partitions"
    _write_trickle_journal(spark, d_crash, touched)

    # torn overwrite: replace ONE touched partition with its merged
    # content (copied from the uninterrupted twin), leave the rest stale
    p0 = touched[0]
    src = os.path.join(_data_dir(crash2), f"pt={p0}")
    dst = os.path.join(d_crash, f"pt={p0}")
    _shutil.rmtree(dst, ignore_errors=True)
    if os.path.isdir(src):
        _shutil.copytree(src, dst)
    # --- crash here: some partitions merged, some stale, journal live ---

    # a plain read fails loudly on a live journal (it can't know the
    # writer is dead); an explicit recover=True rolls back to pre-batch
    import pytest

    with pytest.raises(RuntimeError, match="trickle journal present"):
        read_edge_store(spark, crash)
    assert as_map(read_edge_store(spark, crash, recover=True)) == pre
    # replay from the action log converges to the uninterrupted result
    apply_actions_pruned(spark, crash, acts)
    assert as_map(read_edge_store(spark, crash)) == want
    # journal cleaned up after the successful replay
    assert not os.path.exists(os.path.join(_data_dir(crash), ".trickle-journal"))


def test_trickle_crash_mid_journal_is_noop(spark, tmp_path):
    """Kill while COPYING into the journal (no record yet): data was
    never mutated, recovery just sweeps the torn journal, and the
    merge runs cleanly afterwards."""
    crash, acts, want, pre = _mk_torn_scenario(spark, tmp_path, "midj")
    d_crash = _data_dir(crash)
    jdir = os.path.join(d_crash, ".trickle-journal")
    os.makedirs(os.path.join(jdir, "pt=3"))
    with open(os.path.join(jdir, "pt=3", "part-copy.parquet"), "wb") as f:
        f.write(b"partial copy")  # no record.json -> journal invalid
    assert recover_trickle(spark, d_crash) is False
    assert not os.path.exists(jdir)
    assert as_map(read_edge_store(spark, crash)) == pre
    apply_actions_pruned(spark, crash, acts)
    assert as_map(read_edge_store(spark, crash)) == want


def test_trickle_crash_before_cleanup_rolls_back_then_replays(spark, tmp_path):
    """Kill AFTER the overwrite completed but BEFORE the journal was
    cleared: recovery cannot know the write finished, so it rolls back
    (the safe direction — rollback + replay is exact, double-apply is
    not) and the replay converges."""
    crash, acts, want, pre = _mk_torn_scenario(spark, tmp_path, "precl")
    d_crash = _data_dir(crash)

    # journal the pre-batch state, then run the FULL merge but re-plant
    # the journal as if the final cleanup never happened
    from graphdb_testing_spark.operators.updates import batch_delta, both_directions, decode_actions, _store_pt

    delta = batch_delta(both_directions(decode_actions(acts))).withColumn(
        "pt", _store_pt(8)
    )
    touched = sorted(r["pt"] for r in delta.select("pt").distinct().collect())
    jsave = str(tmp_path / "jsave")
    _write_trickle_journal(spark, d_crash, touched)
    _shutil.copytree(os.path.join(d_crash, ".trickle-journal"), jsave)
    apply_actions_pruned(spark, crash, acts)  # clears the journal itself
    assert as_map(read_edge_store(spark, crash)) == want
    _shutil.copytree(jsave, os.path.join(d_crash, ".trickle-journal"))
    # --- crash here: merge durable, journal still present ---

    assert recover_trickle(spark, d_crash) is True  # rolls BACK
    assert as_map(read_edge_store(spark, crash)) == pre
    apply_actions_pruned(spark, crash, acts)  # replay from the log
    assert as_map(read_edge_store(spark, crash)) == want


def test_trickle_crash_during_recovery_is_idempotent(spark, tmp_path):
    """Kill DURING recovery (record present, one partition already
    restored): a second recovery pass restores the rest — copy-based
    restore with record-deleted-last makes recovery re-runnable."""
    crash, acts, want, pre = _mk_torn_scenario(spark, tmp_path, "rec2")
    d_crash = _data_dir(crash)
    from graphdb_testing_spark.operators.updates import batch_delta, both_directions, decode_actions, _store_pt

    delta = batch_delta(both_directions(decode_actions(acts))).withColumn(
        "pt", _store_pt(8)
    )
    touched = sorted(r["pt"] for r in delta.select("pt").distinct().collect())
    _write_trickle_journal(spark, d_crash, touched)
    # tear every touched partition (simulate a wild overwrite), then
    # simulate a half-finished recovery: restore touched[0] by hand
    for p in touched:
        _shutil.rmtree(os.path.join(d_crash, f"pt={p}"), ignore_errors=True)
    j0 = os.path.join(d_crash, ".trickle-journal", f"pt={touched[0]}")
    if os.path.isdir(j0):
        _shutil.copytree(j0, os.path.join(d_crash, f"pt={touched[0]}"))
    # --- crash during recovery; journal record still present ---
    assert recover_trickle(spark, d_crash) is True
    assert as_map(read_edge_store(spark, crash)) == pre
    apply_actions_pruned(spark, crash, acts)
    assert as_map(read_edge_store(spark, crash)) == want


def test_trickle_journal_restores_annihilated_partition_dir(spark, tmp_path):
    """A touched partition whose merge result is EMPTY has its dir
    deleted by the annihilation sweep; a crash after that delete but
    before cleanup must restore the dir from the journal on rollback
    (delete orientation of the sqlite insert/remove loop)."""
    # base with exactly one edge pair in some partition; delete it all
    base = _edges(spark, [(1, 2, 5), (2, 1, 5), (30, 31, 4), (31, 30, 4)])
    acts = _actions(spark, [(0, ~1, ~2, 0), (1, ~2, ~1, 0)])
    crash = str(tmp_path / "annih_crash")
    init_edge_store(base, crash, n_parts=8)
    pre = as_map(read_edge_store(spark, crash))
    d_crash = _data_dir(crash)

    from graphdb_testing_spark.operators.updates import batch_delta, both_directions, decode_actions, _store_pt

    delta = batch_delta(both_directions(decode_actions(acts))).withColumn(
        "pt", _store_pt(8)
    )
    touched = sorted(r["pt"] for r in delta.select("pt").distinct().collect())
    _write_trickle_journal(spark, d_crash, touched)
    for p in touched:  # annihilation sweep happened, then crash
        _shutil.rmtree(os.path.join(d_crash, f"pt={p}"), ignore_errors=True)
    assert recover_trickle(spark, d_crash) is True
    assert as_map(read_edge_store(spark, crash)) == pre
    out = apply_actions_pruned(spark, crash, acts)
    assert out["touched"] == len(touched)
    assert as_map(read_edge_store(spark, crash)) == {(30, 31): 4, (31, 30): 4}


def test_auto_picker_heals_crashed_trickle(spark, tmp_path):
    """ADVICE r9: apply_actions_auto is the writer entry point, so a
    hot trickle journal (crashed merge) must auto-recover through the
    picker — a re-run of the merge heals the store instead of raising
    the reader's fail-loud RuntimeError (which made the documented
    replay-from-action-log story unreachable via the picker)."""
    crash, acts, want, pre = _mk_torn_scenario(spark, tmp_path, "autoheal")
    d_crash = _data_dir(crash)

    from graphdb_testing_spark.operators.updates import (
        apply_actions_auto,
        batch_delta,
        both_directions,
        decode_actions,
        _store_pt,
    )

    delta = batch_delta(both_directions(decode_actions(acts))).withColumn(
        "pt", _store_pt(8)
    )
    touched = sorted(r["pt"] for r in delta.select("pt").distinct().collect())
    _write_trickle_journal(spark, d_crash, touched)
    # --- crash here: journal live, data pre-batch ---

    # replaying the SAME batch through the picker rolls back (no-op
    # here — data was never mutated) and converges, on every strategy
    got, strategy = apply_actions_auto(
        spark, acts, store_path=crash, force="pruned"
    )
    assert as_map(got) == want
    assert not os.path.exists(os.path.join(d_crash, ".trickle-journal"))

    # same through a rewrite strategy on a fresh crashed twin
    crash2, acts2, want2, _ = _mk_torn_scenario(spark, tmp_path, "autoheal2")
    _write_trickle_journal(spark, _data_dir(crash2), touched)
    got2, _ = apply_actions_auto(
        spark, acts2, store_path=crash2, force="rewrite"
    )
    assert as_map(got2) == want2
