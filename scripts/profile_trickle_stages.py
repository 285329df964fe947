"""Attribute the trickle small-batch fixed cost (round-9 stretch 7).

The SCALE-24 trickle stream measured ~73s per 50-action durable
sliver commit (`SCALE24_r09.log`, pruned regime 20/20) without saying
WHERE the time goes.  This profile initializes a store from a cached
bench graph (untimed), then pushes N seq-contiguous 50-action batches
through :func:`apply_actions_auto` and prints each batch's per-stage
wall clock from the pruned path's ``stage_s`` record (recover /
delta_fold / base_read / journal_copy / overwrite_write /
annihilate_cleanup) plus the picker's strategy.

Usage::

    python scripts/profile_trickle_stages.py [graph_parquet] [n_batches]
        [--out FILE]

Defaults: the SCALE-24 bench cache, 5 batches.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from graphdb_testing_spark.operators.updates import (  # noqa: E402
    apply_actions_auto,
    init_edge_store,
)
from graphdb_testing_spark.session import get_spark  # noqa: E402
from graphdb_testing_spark.sources.rmat import rmat_actions  # noqa: E402


def main() -> int:
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if not a.startswith("--")]
    graph = (
        args[0]
        if args
        else ".bench_cache/rmat_s24_ef8_seed1/edges.parquet"
    )
    nb = int(args[1]) if len(args) > 1 else 5
    per = 50

    # scale is recoverable from the tier directory name (rmat_s{N}_)
    scale = int(graph.split("rmat_s")[1].split("_")[0]) if "rmat_s" in graph else 24

    heap_g = max(48, min(100, (2 * (2**scale) * 8) // 2_800_000))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{heap_g}g")
    spark = get_spark(
        app_name="profile-trickle",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    edges = spark.read.parquet(graph)
    t0 = time.time()
    store = tempfile.mkdtemp(prefix="trickle_prof_")
    shutil.rmtree(store)
    n_parts = init_edge_store(edges, store)
    init_s = round(time.time() - t0, 1)
    print(f"store init: {init_s}s, n_parts={n_parts}", file=sys.stderr)

    acts = rmat_actions(spark, scale, nb * per).localCheckpoint()
    acts.count()

    batches = []
    for i in range(nb):
        batch = acts.filter(
            (F.col("seq") >= i * per) & (F.col("seq") < (i + 1) * per)
        )
        st: dict = {}
        t0 = time.time()
        _, strategy = apply_actions_auto(spark, batch, store_path=store, stats=st)
        total = round(time.time() - t0, 3)
        rec = {
            "batch": i,
            "actions": per,
            "strategy": strategy,
            "total_s": total,
            **st.get("pruned", {}),
        }
        batches.append(rec)
        print(json.dumps(rec), file=sys.stderr)

    agg: dict[str, float] = {}
    for b in batches:
        for k, v in b.get("stage_s", {}).items():
            agg[k] = round(agg.get(k, 0.0) + v, 2)
    result = {
        "type": "trickle-stage-profile",
        "graph": graph,
        "scale": scale,
        "n_batches": nb,
        "actions_per_batch": per,
        "store_n_parts": n_parts,
        "store_init_s": init_s,
        "batches": batches,
        "stage_totals_s": agg,
        "mean_batch_s": round(
            sum(b["total_s"] for b in batches) / len(batches), 2
        ),
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    shutil.rmtree(store, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
