"""Bucketed-edge-layout A/B under the iterative kernels (round-8
verdict task 6).

Question: at SCALE-24 (265M directed edges), does a dst-hash-
partitioned edge layout — the in-session equivalent of a dst-bucketed
store (``sources/bucketed.py``), which removes the per-round edge-side
Exchange from the kernels' ``edges ⋈ state`` join — beat the current
uniform-coalesce layout, where AQE re-plans (and skew-splits) the
edge exchange every round?

History: the round-3 A/B at R-MAT scale 18 rejected dst-
prepartitioning (22.4s vs 17.9s for PR-40; see the comment in
``operators/pagerank.py``), but that measurement was inside host
noise.  This script re-runs it where the effect is resolvable, with
the fixed-work join+agg+shuffle probe (``bench.py:calibrate_shuffle``)
after every kernel so a host-drift swing is attributable.

Both layouts run the SAME kernel code (`dst_partitioned=` flag picks
the layout of the constant edge relation); results are checked equal
across layouts (component count, Σpr) — a layout that changes answers
is a bug, not a win.

Reuses the bench_rmat.py graph cache.  Usage::

    python scripts/bench_bucketed_ab.py [tiny|small|medium|large22|large] [--out FILE]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bench import calibrate_shuffle  # noqa: E402
from graphdb_testing_spark.operators.components import (  # noqa: E402
    connected_components,
)
from graphdb_testing_spark.operators.pagerank import pagerank  # noqa: E402
from graphdb_testing_spark.session import get_spark  # noqa: E402
from graphdb_testing_spark.sources.rmat import rmat_graph  # noqa: E402

SCALES = {"tiny": 10, "small": 15, "medium": 20, "large22": 22, "large": 24}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    size = args[0] if args else "medium"
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    scale = SCALES[size]

    ne_raw = 2 * (2**scale) * 8
    sp = max(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), ne_raw // 250_000)
    os.environ.setdefault(
        "SPARK_GRAFT_DRIVER_MEM", f"{max(48, min(100, ne_raw // 2_800_000))}g"
    )
    spark = get_spark(
        app_name=f"bench-bucketed-ab-{size}",
        shuffle_partitions=min(sp, 2048),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # 100-iteration kernels accumulate shuffle files until a
            # driver GC lets the ContextCleaner reap them; with a 95g
            # heap that GC may never come before the disk fills
            # (measured: ENOSPC in the SCALE-24 dst PR run).  Force a
            # periodic GC so shuffle dirs are bounded by the live set.
            "spark.cleaner.periodicGC.interval": "120s",
        },
    )
    n_threads = spark.sparkContext.defaultParallelism

    cache_root = os.environ.get("SPARK_GRAFT_BENCH_CACHE", ".bench_cache")
    graph_path = os.path.join(
        cache_root, f"rmat_s{scale}_ef8_seed1", "edges.parquet"
    )
    if not os.path.isfile(os.path.join(graph_path, "_SUCCESS")):
        print(f"building SCALE-{scale} graph into {graph_path}", file=sys.stderr)
        rmat_graph(spark, scale, 8).write.mode("overwrite").parquet(graph_path)
    edges = spark.read.parquet(graph_path).localCheckpoint()
    ne = edges.count()

    calibrate_shuffle(spark, n_threads)  # warmup, untimed

    rows = []

    def run(kernel: str, layout: str) -> None:
        dst = layout == "dst_partitioned"
        t0 = time.time()
        if kernel == "cc":
            labels = connected_components(edges, dst_partitioned=dst)
            invariant = labels.select("label").distinct().count()
            labels.unpersist()
        else:
            pr = pagerank(edges, dst_partitioned=dst)
            invariant = round(
                pr.agg(F.sum("pr").alias("s")).collect()[0]["s"], 9
            )
            pr.unpersist()
        el = round(time.time() - t0, 3)
        probe = calibrate_shuffle(spark, n_threads)
        rows.append(
            {
                "kernel": kernel,
                "layout": layout,
                "sec": el,
                "probe_ts": probe,
                "invariant": invariant,
            }
        )
        print(json.dumps(rows[-1]), file=sys.stderr)

    # interleave layouts so slow ambient drift hits both sides alike.
    # --dst-only skips the uniform side (use when the SAME-config
    # bench_rmat run just recorded it, probes included — splice those
    # numbers in from its state.json via --uniform-from)
    dst_only = "--dst-only" in sys.argv
    if dst_only and "--uniform-from" in sys.argv:
        import json as _json

        st = _json.load(
            open(sys.argv[sys.argv.index("--uniform-from") + 1])
        )
        for kernel, tkey in (("cc", "sv"), ("pr", "pr")):
            rows.append(
                {
                    "kernel": kernel,
                    "layout": "uniform",
                    "sec": st["t"][tkey],
                    "probe_ts": st["probes"].get(tkey),
                    "invariant": (
                        st["meta"]["n_components"]
                        if kernel == "cc"
                        else round(st["meta"]["pr_sum"], 9)
                    ),
                    "source": "bench_rmat state.json (same session config)",
                }
            )
    kernels = ("cc", "pr")
    if "--kernels" in sys.argv:
        kernels = tuple(
            sys.argv[sys.argv.index("--kernels") + 1].split(",")
        )
    for kernel in kernels:
        for layout in ("uniform", "dst_partitioned"):
            if dst_only and layout == "uniform":
                continue
            run(kernel, layout)

    ok = all(
        len({r["invariant"] for r in rows if r["kernel"] == k}) == 1
        for k in kernels
    )
    result = {
        "type": "bucketed-layout-ab",
        "size": size,
        "ne": ne,
        "threads": n_threads,
        "probe_work": "join+agg+shuffle: 2^24 fact x 2^22 dim into 2^21 keys",
        "runs": rows,
        # a --dst-only run has no uniform rows: emit ratio None rather
        # than dying in a comprehension at the end of an expensive run
        "ratios": {
            k: (
                round(dst_s / uni_s, 4)
                if dst_s is not None and uni_s is not None
                else None
            )
            for k in kernels
            for dst_s, uni_s in [
                (
                    next(
                        (
                            r["sec"] for r in rows
                            if r["kernel"] == k
                            and r["layout"] == "dst_partitioned"
                        ),
                        None,
                    ),
                    next(
                        (
                            r["sec"] for r in rows
                            if r["kernel"] == k and r["layout"] == "uniform"
                        ),
                        None,
                    ),
                )
            ]
        },
        "invariants_match_across_layouts": ok,
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    if not ok:
        raise SystemExit("layouts disagree on kernel results")


if __name__ == "__main__":
    main()
