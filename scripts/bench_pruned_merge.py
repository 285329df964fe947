"""Pruned-merge crossover measurement on a large stored edge table.

The sf0.1 numbers in BENCHMARKS.md show the partition-pruned stored
merge LOSING on wall-clock at a 40 MB toy table (fixed job costs
dominate).  This script measures the same A/B on a table big enough
for the IO term to matter — the R-MAT SCALE-22 graph (65.7M directed
edges, ~1.5 GB as parquet) — which is where the design claim ("a
small batch against a large table rewrites the touched fraction, not
everything") either shows up on the clock or doesn't.

For each batch size the full-rewrite side is timed END TO END the way
a stored table would actually be maintained: merge + write the whole
merged table back to parquet.  The pruned side is
``apply_actions_pruned`` against a B-partition hash store (pruned
read + merge + dynamic-partition-overwrite write of touched
partitions only).

Reuses the ``bench_rmat.py`` graph cache (``$SPARK_GRAFT_BENCH_CACHE``,
default ``.bench_cache/``) so the 4-minute SCALE-22 build is paid
once.  Usage::

    python scripts/bench_pruned_merge.py [tiny|small|medium|large22|large24] [B|auto]

``auto`` (or omitting B) sizes the store with ``derive_n_parts`` from
the table row count — the 262k-rows/partition rule — and reports the
derived B, so the measured crossover map and the auto-sizing rule are
verified against each other.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from graphdb_testing_spark.operators.updates import (  # noqa: E402
    apply_actions,
    apply_actions_pruned,
    derive_n_parts,
    init_edge_store,
    read_edge_store,
)
from graphdb_testing_spark.session import get_spark  # noqa: E402
from graphdb_testing_spark.sources.rmat import (  # noqa: E402
    rmat_actions,
    rmat_graph,
)

SCALES = {"tiny": 10, "small": 15, "medium": 20, "large22": 22, "large24": 24}
# override e.g. SPARK_GRAFT_MERGE_BATCHES=10,1000 for a trickle-only run
BATCHES = [
    int(b)
    for b in os.environ.get("SPARK_GRAFT_MERGE_BATCHES", "10,1000,100000").split(",")
]


def main() -> None:
    size = sys.argv[1] if len(sys.argv) > 1 else "large22"
    b_arg = sys.argv[2] if len(sys.argv) > 2 else "auto"
    n_parts = None if b_arg == "auto" else int(b_arg)
    scale = SCALES[size]

    ne_raw = 2 * (2**scale) * 8
    sp = max(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), ne_raw // 250_000)
    os.environ.setdefault(
        "SPARK_GRAFT_DRIVER_MEM", f"{max(48, min(100, ne_raw // 2_800_000))}g"
    )
    spark = get_spark(
        app_name=f"bench-pruned-merge-{size}",
        shuffle_partitions=min(sp, 2048),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    cache_root = os.environ.get("SPARK_GRAFT_BENCH_CACHE", ".bench_cache")
    graph_path = os.path.join(cache_root, f"rmat_s{scale}_ef8_seed1", "edges.parquet")
    if not os.path.isfile(os.path.join(graph_path, "_SUCCESS")):
        print(f"building SCALE-{scale} graph into {graph_path}", file=sys.stderr)
        rmat_graph(spark, scale, 8).write.mode("overwrite").parquet(graph_path)
    edges = spark.read.parquet(graph_path)
    ne = edges.count()
    derived = n_parts is None
    if derived:
        n_parts = derive_n_parts(ne)
        print(f"derived n_parts={n_parts} from ne={ne}", file=sys.stderr)

    work = os.path.join(cache_root, f"pruned_merge_s{scale}_b{n_parts}")
    store = os.path.join(work, "store")
    full_out = os.path.join(work, "full_out")
    shutil.rmtree(work, ignore_errors=True)

    t0 = time.time()
    init_edge_store(edges, store, n_parts=n_parts)
    t_init = round(time.time() - t0, 2)

    rows = []
    for na in BATCHES:
        acts = rmat_actions(spark, scale, na).localCheckpoint()
        acts.count()

        # full rewrite: merge + write the ENTIRE merged table back
        t0 = time.time()
        merged = apply_actions(read_edge_store(spark, store), acts)
        merged.write.mode("overwrite").parquet(full_out)
        t_full = round(time.time() - t0, 2)

        # pruned: rewrite only touched partitions (then undo for the
        # next batch size by re-initializing the store)
        t0 = time.time()
        info = apply_actions_pruned(spark, store, acts, n_parts=n_parts)
        t_pruned = round(time.time() - t0, 2)

        # integrity: stored result must equal the full-rewrite result
        # BY CONTENT, not just cardinality — an order-insensitive
        # (count, sum-of-row-hash) signature over (src,dst,wgt) catches
        # a pruned-merge bug that corrupts weights or swaps edges while
        # preserving row count (round-5 advice)
        def _sig(df):
            # 2^30 modulus keeps the sum inside int64 (ANSI) up to
            # ~8.6e9 rows; a corrupted row still flips the sum w.p.
            # 1 - 2^-30
            r = df.agg(
                F.count("*").alias("n"),
                F.sum(
                    F.pmod(F.xxhash64("src", "dst", "wgt"), F.lit(1 << 30))
                ).alias("h"),
            ).collect()[0]
            return (r["n"], r["h"])

        sig_store = _sig(read_edge_store(spark, store))
        sig_full = _sig(spark.read.parquet(full_out))
        rows.append(
            {
                "batch": na,
                "touched": info["touched"],
                "n_parts": n_parts,
                "pruned_s": t_pruned,
                "full_rewrite_s": t_full,
                "rows_match": sig_store[0] == sig_full[0],
                "content_match": sig_store == sig_full,
                "ne_after": sig_store[0],
            }
        )
        print(json.dumps(rows[-1]), file=sys.stderr)
        if na != BATCHES[-1]:
            init_edge_store(edges, store, n_parts=n_parts)  # reset

    print(
        json.dumps(
            {
                "type": "pruned-merge-ab",
                "size": size,
                "ne": ne,
                "n_parts": n_parts,
                "n_parts_derived": derived,
                "store_init_s": t_init,
                "rows": rows,
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
