"""Benchmark harness — mirrors the reference's RSLT JSON emitter.

Runs the headline kernels at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints
ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Kernel names follow the reference result files
(``tests/sqlite/test.c:364-375``): build / sv (connected components) /
sssp (BFS) / pr (PageRank to convergence) / update (action merge),
plus engine extensions (triangles, q1, dedup/ANN once implemented).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from graphdb_testing_spark import datasets  # noqa: E402
from graphdb_testing_spark.operators.bfs import bfs  # noqa: E402
from graphdb_testing_spark.operators.components import (  # noqa: E402
    connected_components,
)
from graphdb_testing_spark.operators.pagerank import pagerank  # noqa: E402
from graphdb_testing_spark.operators.triangles import (  # noqa: E402
    triangles_per_vertex,
)
from graphdb_testing_spark.operators.updates import apply_actions  # noqa: E402
from graphdb_testing_spark import queries_curation  # noqa: E402,F401 (registers)
from graphdb_testing_spark import queries_temporal  # noqa: E402,F401 (registers)
from graphdb_testing_spark.queries import all_queries  # noqa: E402
from graphdb_testing_spark.session import get_spark  # noqa: E402


#: fixed calibration work: rows hashed PER PARTITION per calibration
#: run (so the single-thread and n-thread controls each keep every
#: participating core busy ~1.5s, past task-launch overhead).  Constant
#: across rounds BY CONTRACT — changing it invalidates cross-round
#: normalization (bump the calib "work" tag if it ever must change).
_CALIB_ROWS_PER_PART = 1 << 27


def calibrate(spark, n_parts: int) -> float:
    """Fixed-work JVM-side busy kernel: ``sum(xxhash64(id))`` over
    ``range(n_parts * 2^27)`` split into ``n_parts`` partitions,
    wall-clock seconds.  Whole-stage-codegen CPU work with no shuffle
    and no I/O, so its runtime tracks ONLY host compute speed — a 1.4x
    ambient slowdown (round-5 verdict: 54s -> 77s with bit-identical
    plans) shows up as a 1.4x calibration slowdown, letting the bench
    artifact distinguish host drift from plan regressions on its own.
    ``n_parts=1`` measures single-thread speed; ``n_parts=threads``
    measures the parallel lane the kernels actually run in (per-task
    work identical, so contention/frequency drift is the only mover).
    """
    t0 = time.time()
    # pmod bounds the sum inside int64 (ANSI mode); the hash still runs
    spark.range(0, n_parts * _CALIB_ROWS_PER_PART, 1, n_parts).select(
        F.sum(F.pmod(F.xxhash64("id"), F.lit(1000003))).alias("s")
    ).collect()
    return round(time.time() - t0, 4)


def run_suite(spark, sf_dir: str) -> tuple[dict[str, float], dict[str, int]]:
    """One full pass over the kernel suite; returns (timings, meta)."""
    timings: dict[str, float] = {}
    meta: dict[str, int] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 4)
        return out

    # build: derive + canonicalize + materialize the part-supplier graph
    def _build():
        g = datasets.part_supplier_graph(spark, sf_dir).canonical()
        meta["ne"] = g.num_edges()  # directed count; forces materialization
        meta["nv"] = g.num_vertices()
        return g

    g = timed("build", _build)

    # sv: connected components to fixpoint + component count
    def _sv():
        labels = connected_components(g.edges)
        n = labels.select("label").distinct().count()
        meta["n_components"] = n
        labels.unpersist()
        return n

    timed("sv", _sv)

    # sssp: BFS from min vertex id
    def _sssp():
        src = g.edges.agg(F.min("src").alias("s")).collect()[0]["s"]
        dist = bfs(g.edges, int(src))
        meta["bfs_reached"] = dist.count()
        dist.unpersist()

    timed("sssp", _sssp)

    # pr: PageRank to convergence (reference params d=.85 eps=1e-8 max 100)
    def _pr():
        pr = pagerank(g.edges)
        pr.count()
        pr.unpersist()

    timed("pr", _pr)

    # update: merge the full action stream (M13).  The reference times
    # batch insertions into an ALREADY-BUILT graph (tests/stinger/
    # main.c:165-204 starts the timer after stinger_set_initial_edges),
    # so the action decode+count and base-graph build stay outside the
    # timed section; the timer covers the merge itself.
    acts = datasets.actions_stream(spark, sf_dir).localCheckpoint()
    meta["na"] = acts.count()
    ug = datasets.user_graph(spark, sf_dir)
    # localCheckpoint (not count) — the derivation (events self-join)
    # must actually be materialized, or the timer re-runs it
    ug_edges = ug.edges.localCheckpoint()
    ug_edges.count()

    def _update():
        merged = apply_actions(ug_edges, acts)
        meta["edges_after_update"] = merged.count()

    timed("update", _update)

    # tri: exact triangle counting on the (dense) user graph
    # (base graph materialized above — the timer covers the kernel)
    def _tri():
        tri = triangles_per_vertex(ug_edges)
        meta["total_ntri"] = tri.agg(F.sum("ntri").alias("s")).collect()[0]["s"]

    timed("tri", _tri)

    # q1: relational aggregation layer
    q1 = all_queries()["q1_pricing_summary"]
    timed("q1", lambda: q1(spark, sf_dir).collect())

    # dedup: MinHash+LSH near-duplicate pairs over documents (the
    # training-data pipeline headline; shingle explode + band join)
    def _dedup():
        from graphdb_testing_spark.functions.dedup import minhash_near_duplicates

        docs = datasets.load_table(spark, sf_dir, "documents")
        meta["near_dup_pairs"] = minhash_near_duplicates(docs).count()

    timed("dedup", _dedup)

    # asof: point-in-time join over the event stream (one shuffle +
    # window; feature-join shape)
    asof = all_queries()["asof_latest_purchase"]
    timed("asof", lambda: asof(spark, sf_dir).count())

    # curation: composite corpus keep/drop decision over documents
    # (dedup + length + diversity + repetition signals in one pass)
    def _curation():
        cur = all_queries()["curation_decision"]
        meta["docs_kept"] = cur(spark, sf_dir).filter("keep = 1").count()

    timed("curation", _curation)
    return timings, meta


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark(
        app_name="graphdb-testing-spark-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    # best-of-N (round-3 verdict: a single contended run once read as a
    # 9/10-kernel regression that three clean runs disproved — take the
    # per-kernel minimum so the artifact reports kernel cost, not host
    # noise).  Caches are cleared between reps so every rep recomputes
    # from parquet; the OS page cache staying warm is the point.
    n_threads = spark.sparkContext.defaultParallelism
    calibrate(spark, n_threads)  # JIT/codegen warmup, untimed
    runs: list[tuple[dict[str, float], dict[str, int]]] = []
    calibs: list[dict[str, float]] = []
    for rep in range(reps):
        runs.append(run_suite(spark, sf_dir))
        spark.catalog.clearCache()
        # fixed-work calibration AFTER each rep, same host state the
        # rep's kernels just ran in — the drift control (round-5
        # verdict task 2)
        calibs.append(
            {"t1": calibrate(spark, 1), "tn": calibrate(spark, n_threads)}
        )
        print(
            f"[rep {rep + 1}/{reps}] total "
            f"{round(sum(runs[-1][0].values()), 2)}s "
            f"calib t1={calibs[-1]['t1']}s tn={calibs[-1]['tn']}s",
            file=sys.stderr,
        )
    meta = runs[-1][1]
    for t, m_ in runs[:-1]:
        assert m_ == meta, f"meta drifted across reps: {m_} != {meta}"
    timings = {
        k: min(t[k] for t, _ in runs) for k in runs[0][0]
    }
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "kernel_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "meta": meta,
                "update_eps": (
                    round(meta["na"] / timings["update"], 1)
                    if timings.get("update")
                    else None
                ),
                "reps": reps,
                # self-describing protocol (round-4 verdict): `value`
                # is the sum of per-kernel minima across reps, which
                # can sit below the best single rep; best_rep_total is
                # the fastest whole pass for anyone who prefers it
                "protocol": "min-per-kernel-over-reps",
                "rep_totals": [
                    round(sum(t.values()), 4) for t, _ in runs
                ],
                "best_rep_total": round(
                    min(sum(t.values()) for t, _ in runs), 4
                ),
                # drift control: fixed-work CPU calibration per rep
                # (sum(xxhash64(id)), 2^27 rows PER PARTITION; t1 = 1
                # partition, tn = one per thread).  Round-over-round, divide
                # kernel totals by the calib ratio before calling a
                # swing a regression: a host-drift round moves value
                # AND calib together; a plan regression moves only
                # value.  `value_per_calib` is the dimensionless
                # headline (suite cost in parallel-calibration units).
                "calib": {
                    "work": "sum(xxhash64(id)) 2^27 rows/partition",
                    "threads": n_threads,
                    "per_rep": calibs,
                    "t1_min": round(min(c["t1"] for c in calibs), 4),
                    "tn_min": round(min(c["tn"] for c in calibs), 4),
                },
                "value_per_calib": round(
                    total / min(c["tn"] for c in calibs), 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
