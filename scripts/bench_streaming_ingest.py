"""Sustained streaming-ingest throughput (round-8 verdict task 5).

Every streaming operator in the package has replay-parity tests; this
script adds the MEASURED sustained rate the reference's update metric
actually is — a stream, not one bulk merge:

* **action merge stream** — the sf0.1 action history split into N
  parquet files and replayed through :func:`run_structured_stream`
  (``foreachBatch`` merge, ``maxFilesPerTrigger=1`` → N micro-
  batches) against the materialized user graph.  Reports actions/sec
  end-to-end, per-batch seconds, and the batch-merge comparison: the
  SAME actions as ONE ``apply_actions`` batch on the same host,
  immediately after.  Gate: streamed final edge count == bulk count
  (batch_delta is the sequential-replay fixpoint, so they must agree
  exactly).

* **document ingest gate** — sf0.1 documents replicated R× (exact
  copies, the dedup regime), written as N files, driven through
  :func:`streaming_ingest_decisions` (Gopher quality gate + exact-
  dedup fingerprint state).  Reports docs/sec, per-batch durations
  (p50/p95), decision mix, and the state-rows trajectory from
  ``state_telemetry``.  Gate: one decision per document, and dup
  decisions ≥ (R-1)/R of quality-passing docs.

Usage::

    python scripts/bench_streaming_ingest.py [sf_dir] [n_files] [R] [--out FILE]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from graphdb_testing_spark import datasets  # noqa: E402
from graphdb_testing_spark.operators.updates import apply_actions  # noqa: E402
from graphdb_testing_spark.session import get_spark  # noqa: E402
from graphdb_testing_spark.streaming.workflow import (  # noqa: E402
    run_structured_stream,
    state_telemetry,
    streaming_ingest_decisions,
)


def pctl(xs: list[float], p: float) -> float:
    xs = sorted(xs)
    return round(xs[min(len(xs) - 1, int(p * len(xs)))], 3) if xs else 0.0


def main() -> int:
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]  # value is NOT a positional
    args = [a for a in argv if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n_files = int(args[1]) if len(args) > 1 else 20
    R = int(args[2]) if len(args) > 2 else 4

    spark = get_spark(
        master=None,  # local[$SPARK_GRAFT_CPUS]
        shuffle_partitions=None,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    tmp = tempfile.mkdtemp(prefix="streambench_")
    errs: list[str] = []
    out: dict = {"type": "streaming-ingest-bench", "sf_dir": sf_dir, "n_files": n_files}

    # ----- 1) action merge stream vs one bulk merge -----------------
    acts = datasets.actions_stream(spark, sf_dir).localCheckpoint()
    na = acts.count()
    ug_edges = datasets.user_graph(spark, sf_dir).edges.localCheckpoint()
    ug_edges.count()
    # one file per micro-batch, seq-contiguous so the replay order is
    # the action history's order
    acts.withColumn("f", F.floor(F.col("seq") * n_files / F.lit(na))).repartition(
        1
    ).sortWithinPartitions("seq").write.partitionBy("f").mode("overwrite").parquet(
        tmp + "/actions"
    )
    # the file source replays oldest-mtime-first; a bulk write lands
    # near-identical mtimes, so pin strictly increasing mtimes in seq
    # order — replay order IS part of the semantics (deletes don't
    # commute with inserts on the same key)
    import glob as _glob
    import os as _os

    t_base = time.time() - 3600
    for i in range(n_files):
        for f in _glob.glob(tmp + f"/actions/f={i}/*.parquet"):
            _os.utime(f, (t_base + i, t_base + i))
    progress: dict = {}
    t0 = time.time()
    streamed = run_structured_stream(
        spark,
        tmp + "/actions/f=*",
        ug_edges,
        max_files_per_trigger=1,
        progress=progress,
    )
    n_streamed = streamed.count()
    t_stream = round(time.time() - t0, 3)

    t0 = time.time()
    merged = apply_actions(ug_edges, acts)
    n_bulk = merged.count()
    t_bulk = round(time.time() - t0, 3)

    def _sig(df):
        r = df.agg(
            F.count("*").alias("n"),
            F.sum(F.pmod(F.xxhash64("src", "dst", "wgt"), F.lit(1 << 30))).alias(
                "h"
            ),
        ).collect()[0]
        return (r["n"], r["h"])

    sig_stream, sig_bulk = _sig(streamed), _sig(merged)
    if sig_stream != sig_bulk:
        errs.append(
            f"stream/bulk content mismatch: {sig_stream} != {sig_bulk}"
        )
    batch_secs = [b["sec"] for b in progress.get("batches", [])]
    out["action_merge"] = {
        "actions": na,
        "micro_batches": len(batch_secs),
        "stream_s": t_stream,
        "stream_actions_per_sec": round(na / t_stream, 1),
        "batch_merge_s": t_bulk,
        "batch_actions_per_sec": round(na / t_bulk, 1),
        "stream_over_batch": round(t_stream / t_bulk, 2),
        "batch_sec_p50": pctl(batch_secs, 0.50),
        "batch_sec_p95": pctl(batch_secs, 0.95),
        "edges_after": n_streamed,
    }
    print(json.dumps({"action_merge": out["action_merge"]}), file=sys.stderr)

    # ----- 2) document ingest gate (quality + dedup state) ----------
    docs = datasets.load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    reps = spark.range(R).select(F.col("id").alias("r"))
    corpus = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") * R + F.col("r")).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    n_docs = corpus.count()
    corpus.withColumn(
        "f", F.pmod(F.col("doc_id"), F.lit(n_files))
    ).repartition(1).write.partitionBy("f").mode("overwrite").parquet(
        tmp + "/docs"
    )
    t0 = time.time()
    q = streaming_ingest_decisions(
        spark,
        tmp + "/docs/f=*",
        query_name="ingest_bench",
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    t_ingest = round(time.time() - t0, 3)
    decisions = spark.table("ingest_bench")
    mix = {
        r["decision"]: r["n"]
        for r in decisions.groupBy("decision")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_dec = sum(mix.values())
    if n_dec != n_docs:
        errs.append(f"decisions {n_dec} != docs {n_docs}")
    passed = mix.get("keep", 0) + mix.get("dup", 0)
    if passed and mix.get("dup", 0) < (R - 1) / R * passed * 0.999:
        errs.append(
            f"dup decisions {mix.get('dup', 0)} below the R-replication floor"
        )
    telemetry = state_telemetry(q)
    durations = [
        (p.get("batchDuration") or 0) / 1000.0
        for p in (
            json.loads(pp.json) if not isinstance(pp, dict) else pp
            for pp in q.recentProgress
        )
    ]
    out["doc_ingest"] = {
        "docs": n_docs,
        "replication": R,
        "micro_batches": len(durations),
        "ingest_s": t_ingest,
        "docs_per_sec": round(n_docs / t_ingest, 1),
        "decision_mix": mix,
        "batch_sec_p50": pctl(durations, 0.50),
        "batch_sec_p95": pctl(durations, 0.95),
        "final_state_rows": (telemetry[-1]["state_rows"] if telemetry else None),
        "state_rows_trajectory": [t["state_rows"] for t in telemetry][:64],
    }
    print(json.dumps({"doc_ingest": out["doc_ingest"]}), file=sys.stderr)

    out["invariants"] = "FAIL: " + "; ".join(errs) if errs else "ok"
    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
