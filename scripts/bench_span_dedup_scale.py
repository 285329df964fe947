"""Disk-resident evidence for the exact-substring dedup family
(round-8 verdict task 4).

Builds the same 5M-doc parquet corpus as
``bench_retention_collapse.py`` (sf0.1 documents × D near-variants ×
R exact replicas, written to parquet and re-read so every stage runs
disk-resident), then times each member of the span family with
per-stage wall clocks and volume counters:

* :func:`dedup.repeated_spans` — char-window digests, groupBy df
* :func:`dedup.remove_repeated_spans` — splice repeated spans out
* :func:`dedup.span_duplication_exposure` — per-doc shared fraction
* :func:`dedup.shared_span_pairs` — pair witnesses (run on the R=1
  distinct-variant slice: on an R-fold replicated corpus the witness
  set is Σf² ≈ R²·|distinct| BY DESIGN — that quadratic is the reason
  ``span_duplication_exposure`` exists, and the artifact records the
  predicted pair volume it avoids)

Invariant gates (fail loudly, not just slowly):

* replicated corpus (every doc has ≥ R-1 exact copies): every doc
  with ≥ 1 span must have ``shared_frac == 1.0`` exactly;
* distinct base corpus (sf0.1 documents as-is): mean ``shared_frac``
  must stay < 0.5 (synthetic texts share almost no 10-grams);
* removal conservation: ``length(text) == length(clean_text) +
  removed_chars`` for every document, and the distinct corpus loses
  (almost) nothing.

Usage::

    python scripts/bench_span_dedup_scale.py [R] [D] [sf_dir] [--out FILE]
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
from graphdb_testing_spark.session import get_spark  # noqa: E402

SPAN_LEN = 32  # chars, repeated_spans / removal
STRIDE = 4  # window sampling stride (coverage >= span_len+stride-1)
NGRAM = 10  # words, shared_span_pairs / exposure


def main() -> int:
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]  # value is NOT a positional
    args = [a for a in argv if not a.startswith("--")]
    R = int(args[0]) if len(args) > 0 else 100
    D = int(args[1]) if len(args) > 1 else 10
    sf_dir = args[2] if len(args) > 2 else "/root/testdata/sf0.1"

    spark = get_spark(
        master=None,  # local[$SPARK_GRAFT_CPUS]
        shuffle_partitions=None,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    base = datasets.load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    variants = spark.range(D).select(F.col("id").alias("v"))
    distinct_docs = base.crossJoin(F.broadcast(variants)).select(
        (F.col("doc_id") * D + F.col("v")).alias("doc_id"),
        F.concat_ws(
            " ", "text", F.concat(F.lit("variantmark"), F.col("v"))
        ).alias("text"),
    )
    reps = spark.range(R).select(F.col("id").alias("r"))
    corpus = distinct_docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") * R + F.col("r")).alias("doc_id"), "text"
    )
    d = tempfile.mkdtemp(prefix="span_dedup_")
    # the sf table reads as ONE file -> one partition, and broadcast
    # crossJoins preserve it: without an explicit repartition the
    # 5M-doc corpus write (and every downstream explode) would run on
    # a single task (measured: load ~1.0 for 17 min before the fix)
    n_threads = spark.sparkContext.defaultParallelism
    corpus.repartition(4 * n_threads).write.mode("overwrite").parquet(
        d + "/big"
    )
    distinct_docs.repartition(n_threads).write.mode("overwrite").parquet(
        d + "/distinct"
    )
    big = spark.read.parquet(d + "/big")
    small = spark.read.parquet(d + "/distinct")
    n_docs = big.count()
    n_distinct = small.count()

    stages: dict[str, dict] = {}
    errs: list[str] = []

    def stage(name: str, fn):
        t0 = time.time()
        row = fn()
        stages[name] = {"sec": round(time.time() - t0, 2), **row}
        print(json.dumps({name: stages[name]}), file=sys.stderr)

    # window volume the explode stages shuffle (computed, not guessed)
    win = big.agg(
        F.sum(
            F.greatest(
                (F.length("text") - F.lit(SPAN_LEN)) / F.lit(STRIDE) + 1,
                F.lit(0),
            ).cast("long")
        ).alias("w")
    ).collect()[0]["w"]

    # 1) repeated_spans on the 5M replicated corpus
    def run_repeated():
        spans = dedup.repeated_spans(
            big, span_len=SPAN_LEN, stride=STRIDE, min_docs=2
        ).localCheckpoint()
        n = spans.count()
        occ = spans.agg(F.sum("n_occ")).collect()[0][0]
        return {
            "rows_exploded": int(win),
            "repeated_span_digests": n,
            "total_occurrences": int(occ),
        }

    stage("repeated_spans", run_repeated)

    # 2) remove_repeated_spans on the 5M corpus + conservation gate
    def run_removal():
        cleaned = dedup.remove_repeated_spans(
            big, span_len=SPAN_LEN, stride=STRIDE, min_docs=2
        )
        agg = (
            cleaned.join(big, "doc_id")
            .agg(
                F.count("*").alias("n"),
                F.sum("removed_chars").alias("rm"),
                F.sum(
                    (
                        F.length("text")
                        != F.length("clean_text") + F.col("removed_chars")
                    ).cast("long")
                ).alias("bad"),
            )
            .collect()[0]
        )
        if agg["n"] != n_docs:
            errs.append(f"removal dropped docs: {agg['n']} != {n_docs}")
        if agg["bad"]:
            errs.append(f"removal conservation violated on {agg['bad']} docs")
        return {"docs": agg["n"], "removed_chars": int(agg["rm"])}

    stage("remove_repeated_spans", run_removal)

    # 3) exposure on the replicated corpus: exact 1.0 everywhere
    def run_exposure_big():
        exp = dedup.span_duplication_exposure(big, n=NGRAM)
        agg = exp.filter(F.col("n_spans") > 0).agg(
            F.count("*").alias("n"),
            F.min("shared_frac").alias("mn"),
            F.avg("shared_frac").alias("avg"),
        ).collect()[0]
        if agg["mn"] != 1.0:
            errs.append(
                f"replicated exposure min {agg['mn']} != 1.0 "
                "(every doc has exact copies)"
            )
        return {
            "docs_with_spans": agg["n"],
            "min_shared_frac": agg["mn"],
            "mean_shared_frac": round(agg["avg"], 6),
        }

    stage("span_duplication_exposure_5M", run_exposure_big)

    # 3b) exposure on the raw distinct sf0.1 documents: ≈ 0
    def run_exposure_base():
        exp = dedup.span_duplication_exposure(
            base.select("doc_id", "text"), n=NGRAM
        )
        agg = exp.agg(
            F.count("*").alias("n"), F.avg("shared_frac").alias("avg")
        ).collect()[0]
        if agg["avg"] is not None and agg["avg"] >= 0.5:
            errs.append(
                f"distinct-corpus exposure {agg['avg']} >= 0.5 — "
                "synthetic texts should share almost nothing"
            )
        return {"docs": agg["n"], "mean_shared_frac": round(agg["avg"], 6)}

    stage("span_duplication_exposure_distinct", run_exposure_base)

    # 4) shared_span_pairs on the R=1 distinct-variant slice, plus the
    # predicted (avoided) volume on the replicated corpus
    def run_pairs():
        pairs = dedup.shared_span_pairs(small, n=NGRAM)
        n_pairs = pairs.count()
        return {
            "docs": n_distinct,
            "pairs": n_pairs,
            "replicated_witness_rows_avoided": int(
                stages["repeated_spans"]["total_occurrences"]
            )
            * R,  # each witness row fans ~R-fold per replicated side
        }

    stage("shared_span_pairs_distinct_slice", run_pairs)

    result = {
        "type": "span-dedup-scale",
        "R": R,
        "D": D,
        "n_docs": n_docs,
        "n_distinct_docs": n_distinct,
        "span_len": SPAN_LEN,
        "stride": STRIDE,
        "ngram": NGRAM,
        "stages": stages,
        "invariants": "FAIL: " + "; ".join(errs) if errs else "ok",
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
