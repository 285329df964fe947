"""Session-lifetime variance investigation (round-10 verdict task 6).

Round-10 observed 2-4× wall-clock swings on repeated heavy queries
within one long session (e.g. minhash_near_duplicates 5.1 s vs 23.8 s
minutes apart) that per-rep calibration attributed to ambient/JVM
state rather than plans.  This instrument runs a fixed heavy-query
list for N interleaved reps in ONE session and records, per query
execution: wall seconds, the JVM's cumulative GC time delta
(GarbageCollectorMXBeans), driver heap used before/after
(MemoryMXBean), and per-rep fixed-work calibration probes — the data
that separates "GC/heap pressure grows with session age" from
"ambient host noise" from "JIT/codegen warmup".

Usage::

    python scripts/profile_session_variance.py [sf_dir] [reps] [--out FILE]
        [--conf k=v ...]   # extra Spark conf for fix A/Bs

Emits one JSON document (default stdout or --out).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from bench import calibrate, calibrate_shuffle  # noqa: E402
from graphdb_testing_spark.session import get_spark  # noqa: E402

#: the round-10 sweep's heavy tail — the queries whose repeats swung
HEAVY = [
    "minhash_lsh_candidates",
    "minhash_recall",
    "lsh_s_curve",
    "containment_join",
    "deferred_acceptance_4round",
    "apply_actions_pruned_store",
    "betweenness_4roots",
    "core_numbers",
]


def _jvm_gc_ms(spark) -> float:
    beans = (
        spark._jvm.java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans()
    )
    return float(
        sum(beans.get(i).getCollectionTime() for i in range(beans.size()))
    )


def _heap_used_mb(spark) -> float:
    mem = (
        spark._jvm.java.lang.management.ManagementFactory
        .getMemoryMXBean()
        .getHeapMemoryUsage()
    )
    return round(mem.getUsed() / 1e6, 1)


def main() -> int:
    argv = sys.argv[1:]
    out_path = None
    conf = {}
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    while "--conf" in argv:
        i = argv.index("--conf")
        k, v = argv[i + 1].split("=", 1)
        conf[k] = v
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    reps = int(args[1]) if len(args) > 1 else 4

    spark = get_spark(
        app_name="session-variance",
        extra_conf={"spark.ui.showConsoleProgress": "false", **conf},
    )
    n_threads = spark.sparkContext.defaultParallelism
    qs = entry_mod.queries()
    names = [n for n in HEAVY if n in qs]
    calibrate(spark, n_threads)  # JIT warmup, untimed
    runs: list[dict] = []
    for rep in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"var rep{rep} {name}")
            gc0, h0 = _jvm_gc_ms(spark), _heap_used_mb(spark)
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = round(time.time() - t0, 3)
            runs.append(
                {
                    "rep": rep,
                    "query": name,
                    "wall_s": wall,
                    "gc_ms": round(_jvm_gc_ms(spark) - gc0, 1),
                    "heap_mb_before": h0,
                    "heap_mb_after": _heap_used_mb(spark),
                    "load1": os.getloadavg()[0],
                }
            )
            print(
                f"[rep {rep}] {name}: {wall}s gc={runs[-1]['gc_ms']}ms "
                f"heap {h0}->{runs[-1]['heap_mb_after']}MB",
                file=sys.stderr,
            )
        spark.catalog.clearCache()
        runs.append(
            {
                "rep": rep,
                "query": "_calibration",
                "tn_s": calibrate(spark, n_threads),
                "ts_s": calibrate_shuffle(spark, n_threads),
                "gc_total_ms": _jvm_gc_ms(spark),
                "heap_mb": _heap_used_mb(spark),
            }
        )
    doc = {
        "type": "session-variance",
        "sf_dir": sf_dir,
        "reps": reps,
        "threads": n_threads,
        "extra_conf": conf,
        "runs": runs,
    }
    text = json.dumps(doc)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(text + "\n")
    else:
        print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
