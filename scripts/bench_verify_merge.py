"""A/B the set-similarity verification stage: join-per-item vs
PPJoin-style sorted-set merge (`dedup._verify_intersections`).

Both arms compute the exact per-candidate intersection for the
`containment_join` and `jaccard_prefix_join` workloads at a given sf
directory, interleaved A/B/A/B in one session so JVM warmup and host
drift hit both arms equally.  Asserts the two arms' results are
multiset-identical (exceptAll both ways) before timing is trusted.

Usage::

    python scripts/bench_verify_merge.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graphdb_testing_spark import datasets  # noqa: E402
from graphdb_testing_spark.functions import dedup  # noqa: E402
from graphdb_testing_spark.session import get_spark  # noqa: E402


def _old_verify(cands, items, item_col):
    """The pre-round-7 verification shape: explode candidates to
    (pair x item) rows via a join on the left id, then count matches
    of the right side's (id, item) relation."""
    sa = items.select(F.col("doc_id").alias("a_id"), item_col)
    sb = items.select(F.col("doc_id").alias("b_id"), item_col)
    return (
        cands.join(sa, "a_id")
        .join(sb, ["b_id", item_col])
        .groupBy("a_id", "b_id")
        .agg(F.count("*").cast("long").alias("inter"))
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark(
        app_name="verify-merge-ab",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    docs = datasets.load_table(spark, sf_dir, "documents")

    # containment workload: word tokens, one-sided prefix candidates
    toks = (
        docs.select(
            F.col("doc_id"), F.explode(F.split("text", " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .distinct()
        .localCheckpoint()
    )
    from pyspark.sql import Window

    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    sized = toks.join(dfreq, "tok").withColumn(
        "sz", F.count("*").over(Window.partitionBy("doc_id"))
    )
    pos = sized.withColumn(
        "pos", F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "tok"))
    )
    prefix = pos.filter(
        F.col("pos") <= F.col("sz") - F.ceil(F.lit(0.9) * F.col("sz")) + 1
    ).select(F.col("doc_id").alias("a_id"), "tok")
    cands = (
        prefix.join(toks.withColumnRenamed("doc_id", "b_id"), "tok")
        .filter(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
        .localCheckpoint()
    )
    n_cands = cands.count()
    print(f"containment candidates: {n_cands}")

    # identity gate (once, untimed): multiset equality both ways
    new_df = dedup._verify_intersections(cands, toks, "tok")
    old_df = _old_verify(cands, toks, "tok")
    # join-per-item drops zero-intersection pairs; compare on inter >= 1
    nz = new_df.filter(F.col("inter") >= 1)
    d1 = nz.exceptAll(old_df).count()
    d2 = old_df.exceptAll(nz).count()
    assert d1 == 0 and d2 == 0, f"verification arms diverge: {d1}/{d2}"
    print("identity gate: arms multiset-identical (exceptAll both ways)")

    results = {"sf_dir": sf_dir, "n_cands": n_cands, "rounds": []}
    for rnd in range(3):
        row = {}
        for arm, fn in (
            ("merge", lambda: dedup._verify_intersections(cands, toks, "tok")),
            ("join_per_item", lambda: _old_verify(cands, toks, "tok")),
        ):
            t0 = time.time()
            # sum(inter) + count so Catalyst cannot prune the
            # intersection computation out of the timed plan (a bare
            # count() would drop the merge arm's array_intersect)
            agg = fn().agg(
                F.sum("inter").alias("s"), F.count("*").alias("n")
            ).collect()[0]
            row[arm] = round(time.time() - t0, 2)
            row[f"{arm}_rows"] = agg["n"]
            row[f"{arm}_sum_inter"] = agg["s"]
        row["load1"] = round(os.getloadavg()[0], 1)
        results["rounds"].append(row)
        print(f"[round {rnd + 1}] {row}")
    # the two arms must have aggregated the same work (join-per-item
    # has no zero-intersection rows, so only sums are comparable)
    assert all(
        r["merge_sum_inter"] == r["join_per_item_sum_inter"]
        for r in results["rounds"]
    ), "arms disagree on sum(inter)"
    best_merge = min(r["merge"] for r in results["rounds"])
    best_old = min(r["join_per_item"] for r in results["rounds"])
    results["best_merge_s"] = best_merge
    results["best_join_per_item_s"] = best_old
    results["speedup"] = round(best_old / best_merge, 2)
    print(f"best merge {best_merge}s vs join-per-item {best_old}s "
          f"-> {results['speedup']}x")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
