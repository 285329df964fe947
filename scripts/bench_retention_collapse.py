"""A/B: exact-duplicate collapse in the near-dup retention pipeline.

Builds a heavily exact-duplicated corpus (every sf0.1 document
replicated R times with distinct doc_ids — the web-corpus regime where
exact copies dominate duplication), then times

* **collapsed** — :func:`dedup.dedup_retention` (fingerprint groupBy
  first, MinHash/LSH on distinct-content representatives, clusters
  expanded through the fingerprint map), vs
* **uncollapsed** — the same near-dup clustering run on the full
  replicated corpus (shingle/LSH/verify over every copy, CC over the
  full pair set),

and asserts the two manifests are IDENTICAL row-for-row (exceptAll in
both directions — a true multiset-identity check).  Emits one JSON
line, including the LSH-verify and CC stage wall-times so the report
shows WHERE a disk-resident run spends its time.

Why this regime: pair listing is quadratic in cluster size, so R
exact copies multiply verified pairs by ~R² and shingle volume by R —
the collapse bounds both by distinct-content counts.

Usage::

    python scripts/bench_retention_collapse.py [R] [sf_dir] [collapsed_only] [D]

Pass ``collapsed_only`` as the third argument to time only the
collapsed pipeline (for R where the uncollapsed side's ~R² pair
explosion is infeasible — which is the point being demonstrated).
``D`` (default 1) first fans every base document out to D distinct
near-variants (one appended marker token each) before the R-fold
exact replication — D=10 on sf0.1 gives 50k distinct contents, so
R=100 is a 5M-doc disk-resident corpus.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from graphdb_testing_spark import datasets  # noqa: E402
from graphdb_testing_spark.functions import dedup  # noqa: E402
from graphdb_testing_spark.operators.components import (  # noqa: E402
    connected_components,
)
from graphdb_testing_spark.session import get_spark  # noqa: E402


def uncollapsed_retention(docs, threshold=0.8):
    """The pre-collapse pipeline, verbatim: near-dup pairs over EVERY
    document, CC, manifest join — the baseline the collapse replaced."""
    dup = dedup.minhash_near_duplicates(docs, threshold).select("a_id", "b_id")
    sym = dup.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).unionAll(dup.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
    cc = connected_components(sym)
    sizes = cc.groupBy("label").agg(F.count("*").alias("n"))
    lab = cc.join(sizes, "label").select(F.col("id").alias("_id"), "label", "n")
    return (
        docs.select("doc_id")
        .join(lab, F.col("doc_id") == F.col("_id"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("label"), F.col("doc_id")).cast("long").alias("cluster_id"),
            F.coalesce(F.col("n"), F.lit(1)).cast("long").alias("cluster_size"),
            (F.col("doc_id") == F.coalesce(F.col("label"), F.col("doc_id")))
            .cast("long")
            .alias("keep"),
        )
    )


def content_sig(df):
    """Order-insensitive manifest signature: count + exact (decimal)
    sum of the full 64-bit row hash — collision-resistant enough to
    log; the identity GATE is :func:`manifests_identical`."""
    return df.agg(
        F.count("*").alias("n"),
        F.sum(
            F.xxhash64("doc_id", "cluster_id", "cluster_size", "keep").cast(
                "decimal(38,0)"
            )
        ).cast("string").alias("h"),
    ).collect()[0]


def manifests_identical(a, b) -> bool:
    """True multiset identity: both exceptAll directions empty."""
    cols = ["doc_id", "cluster_id", "cluster_size", "keep"]
    a, b = a.select(*cols), b.select(*cols)
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def main() -> int:
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    D = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    base = datasets.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    if D > 1:
        # D distinct near-variants per base doc: each appends its own
        # marker token, so contents differ (distinct fingerprints) but
        # stay near-duplicates of each other — the realistic mix of
        # exact-copy AND near-variant duplication
        variants = spark.range(D).select(F.col("id").alias("v"))
        base = base.crossJoin(F.broadcast(variants)).select(
            (F.col("doc_id") * D + F.col("v")).alias("doc_id"),
            F.concat_ws(" ", "text", F.concat(F.lit("variantmark"), F.col("v"))).alias(
                "text"
            ),
        )
    n_base = base.count()
    reps = spark.range(R).select(F.col("id").alias("r"))
    corpus = (
        base.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") * R + F.col("r")).alias("doc_id"),
            "text",
        )
    )
    d = tempfile.mkdtemp(prefix="retention_ab_")
    corpus.write.mode("overwrite").parquet(d)
    docs = spark.read.parquet(d)
    n_docs = docs.count()

    collapsed_only = len(sys.argv) > 3 and sys.argv[3] == "collapsed_only"

    stage_times: dict = {}
    t0 = time.time()
    m_c = dedup.dedup_retention(docs, 0.8, stage_times=stage_times)
    sig_c = content_sig(m_c)
    t_collapsed = time.time() - t0

    kept = m_c.agg(F.sum("keep")).collect()[0][0]
    out = {
        "metric": "retention_collapse_ab",
        "R": R,
        "D": D,
        "n_base_docs": n_base,
        "n_docs": n_docs,
        "collapsed_s": round(t_collapsed, 2),
        "stage_s": stage_times,
        "cc_share": round(stage_times.get("cc_s", 0.0) / t_collapsed, 3),
        "kept_docs": int(kept),
        "sig": {"n": int(sig_c.n), "h": str(sig_c.h)},
    }
    if not collapsed_only:
        t0 = time.time()
        m_u = uncollapsed_retention(docs, 0.8)
        sig_u = content_sig(m_u)
        t_uncollapsed = time.time() - t0
        out["uncollapsed_s"] = round(t_uncollapsed, 2)
        out["speedup_x"] = round(t_uncollapsed / t_collapsed, 2)
        # the gate: true multiset identity, not a hash summary
        out["content_match"] = manifests_identical(m_c, m_u)
    print(json.dumps(out))
    return 0 if out.get("content_match", True) else 1


if __name__ == "__main__":
    raise SystemExit(main())
