"""ANN quality at disk-resident scale (round-8 task 6).

The retention pipeline has a measured 5M-doc trend; this script gives
the ANN pack the same: a deterministic 5M-vector corpus (N_DISTINCT
hash-derived base vectors × R near-copies with small jitter, d=64,
written to parquet — the disk-resident regime), then

* exact brute-force top-10 per query (two-phase ``cosine_topk`` — the
  ground truth, and itself a scale exhibit: no per-query
  megapartition);
* IVF sign-bucket top-10 at TWO probe budgets — 1 bucket
  (``multiprobe=False``) and 1+``bucket_dims`` Hamming-1 buckets
  (``multiprobe=True``) — recall@10 against the exact set, the
  recall-vs-probe-count curve;
* the same curve at sf0.1 (2k vectors) for the held-recall gate:
  disk-resident recall at the fixed multiprobe budget must be ≥ the
  sf0.1 figure;
* SemDeDup dedup-rate on a 5M exact-copy corpus: collapse identical
  vectors by fingerprint first (the measured retention trick — the
  pair set is bounded by DISTINCT vectors), ``semdedup_retention`` on
  the representatives, expand through the fingerprint map.

Emits ONE JSON line (the ``SIMSEARCH_AB_r08.json`` artifact).

Usage::

    python scripts/bench_simsearch_scale.py [N_DISTINCT] [R] [N_QUERIES]

Defaults 50_000 × 100 = 5M rows, 40 queries.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from graphdb_testing_spark import datasets  # noqa: E402
from graphdb_testing_spark.functions import simsearch  # noqa: E402
from graphdb_testing_spark.session import get_spark  # noqa: E402

DIM = 64


def _vec(seed_col, salt: str, scale: int = 1_000_000):
    """Deterministic pseudo-uniform [-1, 1] vector from a long column
    — component j hashes (salt, seed, j); JVM-side, no Python."""
    return F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda j: (
            (
                F.pmod(
                    F.xxhash64(F.concat_ws("|", F.lit(salt), seed_col, j)),
                    F.lit(2 * scale + 1),
                )
                - scale
            )
            / scale
        ).cast("float"),
    )


def build_corpus(spark, n_distinct: int, r: int, jitter: float, tag: str):
    """(vec_id, base_id, embedding) — base vector + jitter·noise,
    written to parquet and read back (disk-resident)."""
    rows = spark.range(0, n_distinct * r, 1, 64).select(
        F.col("id").alias("vec_id"),
        F.pmod(F.col("id"), F.lit(n_distinct)).alias("base_id"),
    )
    emb = F.zip_with(
        _vec(F.col("base_id"), "base"),
        _vec(F.col("vec_id"), f"jit{tag}"),
        lambda b, n: (b + F.lit(jitter) * n).cast("float"),
    )
    out = rows.select("vec_id", "base_id", emb.alias("embedding"))
    d = tempfile.mkdtemp(prefix=f"simsearch_{tag}_")
    out.write.mode("overwrite").parquet(d)
    return spark.read.parquet(d)


def recall_at_k(exact, approx) -> float:
    """Mean recall@k of approx vs exact over (query_id, vec_id)."""
    e = exact.select("query_id", "vec_id")
    a = approx.select("query_id", F.col("vec_id").alias("av"))
    per_q = (
        e.join(a, (e.query_id == a.query_id) & (e.vec_id == a.av), "left")
        .drop(a.query_id)
        .groupBy("query_id")
        .agg((F.sum(F.when(F.col("av").isNotNull(), 1).otherwise(0)) / F.count("*")).alias("r"))
    )
    row = per_q.agg(F.avg("r").alias("m"), F.count("*").alias("nq")).collect()[0]
    return round(float(row["m"]), 4)


def probe_curve(corpus, queries, k=10, kmeans_cells=0, kmeans_rounds=1) -> dict:
    """Sign-bucket recall/latency/candidates at two probe budgets,
    plus (when ``kmeans_cells > 0``) the learned-centroid IVF curve
    over nprobe ∈ {1, 2, 4} on the same exact ground truth.

    ``candidates`` is the number of corpus points each index actually
    scans (Σ over queries of probed-bucket/cell sizes) — the cost axis
    of the recall-vs-work trade; "dominates" means fewer candidates at
    ≥ recall."""
    out: dict = {}
    t0 = time.time()
    exact = simsearch.cosine_topk(corpus, queries, k=k).localCheckpoint()
    n_exact = exact.count()
    out["exact_s"] = round(time.time() - t0, 2)
    out["n_exact_rows"] = n_exact

    # ---- sign-bucket side (data-oblivious quantizer) ----
    bsz = (
        corpus.select(simsearch.sign_bucket("embedding", 8).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("sz"))
        .localCheckpoint()
    )
    for label, mp in (("sign_probes_1", False), ("sign_probes_9", True)):
        t0 = time.time()
        approx = simsearch.ivf_topk(
            corpus, queries, k=k, bucket_dims=8, multiprobe=mp
        ).localCheckpoint()
        approx.count()
        rec = recall_at_k(exact, approx)
        qb = queries.select(
            F.col("vec_id").alias("query_id"),
            simsearch.sign_bucket("embedding", 8).alias("bucket"),
        )
        if mp:
            probes = F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(8)],
            )
            qb = qb.withColumn("bucket", F.explode(probes))
        cand = (
            qb.join(bsz, "bucket").agg(F.sum("sz")).collect()[0][0] or 0
        )
        out[label] = {
            "recall_at_10": rec,
            "s": round(time.time() - t0, 2),
            "candidates": int(cand),
        }
        approx.unpersist()

    # ---- learned-centroid IVF (k-means cells, Jégou-style) ----
    if kmeans_cells:
        from pyspark.sql import Window

        from graphdb_testing_spark.functions.simsearch import (
            _INT_DIST2,
            _assign_cells,
            _integerize,
            _lloyd_iterate,
            _pair_sim,
            _topk_per_query,
            with_norm,
        )

        t0 = time.time()
        pts = _integerize(corpus, "vec_id", "embedding").localCheckpoint()
        # √n-sized training is affordable because _lloyd_iterate's
        # assignment step dispatches to the BLAS path at ≥128 cells
        # (round-9 verdict: n_cells=16 at 5M was a misconfigured
        # index, each probe scanned ~312k candidates by construction)
        _, cents = _lloyd_iterate(pts, kmeans_cells, kmeans_rounds)

        def nearest(points, n):
            if n == 1:  # corpus side: shared exact path (BLAS at √n)
                return _assign_cells(points, cents, kmeans_cells).select(
                    "vec_id",
                    F.col("cluster_id").alias("cell"),
                    F.lit(1).alias("rn"),
                )
            # query side: tiny relation, window rank is fine
            scored = points.crossJoin(F.broadcast(cents)).select(
                "vec_id", "cluster_id", F.expr(_INT_DIST2).alias("dist2")
            )
            w = Window.partitionBy("vec_id").orderBy("dist2", "cluster_id")
            return (
                scored.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= n)
                .select("vec_id", F.col("cluster_id").alias("cell"), "rn")
            )

        cells = nearest(pts, 1).drop("rn").localCheckpoint()
        csz = (
            cells.groupBy("cell").agg(F.count("*").alias("sz")).localCheckpoint()
        )
        base = (
            with_norm(corpus, "embedding")
            .select(
                "vec_id",
                F.col("embedding").alias("v"),
                F.col("_norm").alias("nv"),
            )
            .join(cells, "vec_id")
        )
        qpts = _integerize(queries, "vec_id", "embedding")
        probe_budgets = [p for p in (1, 2, 4, 8, 16) if p <= kmeans_cells]
        qprobe_all = (
            nearest(qpts, max(probe_budgets))
            .withColumnRenamed("vec_id", "query_id")
            .localCheckpoint()
        )
        qn = with_norm(queries, "embedding").select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q"),
            F.col("_norm").alias("nq"),
        )
        out["kmeans_train_s"] = round(time.time() - t0, 2)
        out["kmeans_cells"] = kmeans_cells
        occ = csz.agg(
            F.count("*").alias("nonempty"),
            F.max("sz").alias("max_sz"),
            F.avg("sz").alias("avg_sz"),
        ).collect()[0]
        out["kmeans_cell_occupancy"] = {
            "nonempty": int(occ["nonempty"]),
            "max": int(occ["max_sz"]),
            "avg": round(float(occ["avg_sz"]), 1),
        }
        for p in probe_budgets:
            t0 = time.time()
            qp = qprobe_all.filter(F.col("rn") <= p).drop("rn")
            qs = qn.join(qp, "query_id")
            sim = _pair_sim("q", "v", "nq", "nv")
            scored = (
                base.join(F.broadcast(qs), "cell")
                .filter(F.col("vec_id") != F.col("query_id"))
                .select("query_id", "vec_id", sim.alias("sim"))
            )
            approx = _topk_per_query(scored, k).localCheckpoint()
            approx.count()
            rec = recall_at_k(exact, approx)
            cand = qp.join(csz, "cell").agg(F.sum("sz")).collect()[0][0] or 0
            out[f"kmeans_probes_{p}"] = {
                "recall_at_10": rec,
                "s": round(time.time() - t0, 2),
                "candidates": int(cand),
            }
            approx.unpersist()

        # dominance: some k-means point reaches the sign multiprobe
        # recall with fewer scanned candidates
        sp9 = out["sign_probes_9"]
        out["kmeans_dominates_sign"] = any(
            out[f"kmeans_probes_{p}"]["recall_at_10"] >= sp9["recall_at_10"]
            and out[f"kmeans_probes_{p}"]["candidates"] <= sp9["candidates"]
            for p in probe_budgets
        )
    exact.unpersist()
    return out


def main() -> int:
    n_distinct = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    spark = get_spark(
        app_name="simsearch-scale",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    # ---- disk-resident recall-vs-probe-count ----
    t0 = time.time()
    corpus = build_corpus(spark, n_distinct, r, jitter=0.05, tag="near")
    n_corpus = corpus.count()
    build_s = round(time.time() - t0, 2)
    # queries are their own jittered variants of the first n_q base
    # vectors — so each query's true neighbors are that base's copies,
    # the regime an ANN index actually serves (NOT independent random
    # points, whose "nearest neighbors" are meaningless directions)
    q_emb = F.zip_with(
        _vec(F.col("base_id"), "base"),
        _vec(F.col("id"), "qjit"),
        lambda b, n: (b + F.lit(0.05) * n).cast("float"),
    )
    queries = (
        spark.range(n_q)
        .select(
            (-1 - F.col("id")).alias("vec_id"),
            F.pmod(F.col("id"), F.lit(n_distinct)).alias("base_id"),
            F.col("id"),
        )
        .select("vec_id", q_emb.alias("embedding"))
        .localCheckpoint()
    )
    # √n-sized index (round-9 verdict task 3): 2^round(log2(√n)) cells
    # — 2048 at 5M rows, the standard IVF sizing, so each cell holds
    # ~n/√n vectors and probe=1 scans ~√n·copies candidates instead of
    # the n/16 a 16-cell index is forced to
    import math

    n_cells_big = 1 << round(math.log2(math.sqrt(n_corpus)))
    big = probe_curve(
        corpus.select("vec_id", "embedding"), queries,
        kmeans_cells=n_cells_big, kmeans_rounds=1,
    )

    # ---- the sf0.1 reference figure, same probe budgets ----
    emb01 = datasets.load_table(spark, "/root/testdata/sf0.1", "embeddings")
    q01 = emb01.filter(F.col("vec_id") % 100 == 0)
    n01 = emb01.count()
    small = probe_curve(
        emb01, q01,
        kmeans_cells=1 << round(math.log2(math.sqrt(n01))),
        kmeans_rounds=1,
    )

    # ---- SemDeDup dedup-rate at 5M via exact-copy collapse ----
    t0 = time.time()
    dup = build_corpus(spark, n_distinct, r, jitter=0.0, tag="exact")
    fp = dup.select(
        "vec_id", F.xxhash64("embedding").alias("fp"), "embedding"
    ).localCheckpoint()
    reps = (
        fp.groupBy("fp")
        .agg(
            F.min("vec_id").alias("vec_id"),
            F.count("*").alias("copies"),
            F.first("embedding").alias("embedding"),
        )
        .localCheckpoint()
    )
    n_reps = reps.count()
    manifest = simsearch.semdedup_retention(
        reps.select("vec_id", "embedding"),
        threshold=0.95,
        target_cluster_size=1024,
    )
    # expand through the fingerprint map: every copy inherits its
    # representative's cluster; keep only the canonical copy of the
    # canonical representative
    rep_man = reps.select("fp", F.col("vec_id").alias("rep_id")).join(
        manifest.withColumnRenamed("vec_id", "rep_id"), "rep_id"
    )
    expanded = fp.select("vec_id", "fp").join(rep_man, "fp").select(
        "vec_id",
        "cluster_id",
        ((F.col("vec_id") == F.col("rep_id")) & (F.col("keep") == 1))
        .cast("long")
        .alias("keep"),
    )
    kept = expanded.agg(
        F.sum("keep").alias("k"), F.count("*").alias("n")
    ).collect()[0]
    semdedup_s = round(time.time() - t0, 2)
    dedup_rate = round(1.0 - kept["k"] / kept["n"], 6)

    held = (
        big["sign_probes_9"]["recall_at_10"]
        >= small["sign_probes_9"]["recall_at_10"]
    )
    print(
        json.dumps(
            {
                "metric": "simsearch_scale_ab",
                "dim": DIM,
                "corpus": {
                    "n_distinct": n_distinct,
                    "copies": r,
                    "n_rows": n_corpus,
                    "jitter": 0.05,
                    "build_s": build_s,
                },
                "n_queries": n_q,
                "disk_resident": big,
                "sf01_reference": small,
                "recall_held_at_fixed_probe_budget": held,
                "semdedup_5m": {
                    "n_rows": kept["n"],
                    "n_distinct_vectors": n_reps,
                    "kept": int(kept["k"]),
                    "dedup_rate": dedup_rate,
                    "wall_s": semdedup_s,
                    "note": (
                        "exact-copy collapse first (pair set bounded by"
                        " distinct vectors), semdedup on representatives,"
                        " expanded through the fingerprint map"
                    ),
                },
            }
        )
    )
    return 0 if held else 1


if __name__ == "__main__":
    raise SystemExit(main())
