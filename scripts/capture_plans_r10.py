"""Capture .explain('formatted') before/after plans for the round-10
optimization targets into plans/r10/.

"before" = the pre-round-10 plan, reproduced by forcing the new
guarded fast paths off (the fallback branches are the unmodified
original plans); "after" = the shipped defaults.  Usage::

    python scripts/capture_plans_r10.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from graphdb_testing_spark.functions import bitsets  # noqa: E402
from graphdb_testing_spark.operators import bfs as bfsmod  # noqa: E402
from graphdb_testing_spark.operators import components as compmod  # noqa: E402
from graphdb_testing_spark.operators import densegraph  # noqa: E402
from graphdb_testing_spark.operators import community as communitymod  # noqa: E402
from graphdb_testing_spark.operators import kcore as kcoremod  # noqa: E402
from graphdb_testing_spark.operators import pagerank as prmod  # noqa: E402
from graphdb_testing_spark.operators import sampling as samplingmod  # noqa: E402
from graphdb_testing_spark.operators import scc as sccmod  # noqa: E402
from graphdb_testing_spark.functions import simsearch as simsearchmod  # noqa: E402
from graphdb_testing_spark.session import get_spark  # noqa: E402

def _bench_pr_convergence(spark, sf_dir):
    from graphdb_testing_spark import datasets
    from graphdb_testing_spark.operators.pagerank import pagerank

    g = datasets.part_supplier_graph(spark, sf_dir).canonical()
    return pagerank(g.edges)


def _bench_dedup_neardups(spark, sf_dir):
    from graphdb_testing_spark import datasets
    from graphdb_testing_spark.functions.dedup import minhash_near_duplicates

    docs = datasets.load_table(spark, sf_dir, "documents")
    return minhash_near_duplicates(docs)


#: bench.py kernels that are not registry queries — captured under
#: these pseudo-names
EXTRA = {
    "bench_pr_convergence": _bench_pr_convergence,
    "bench_dedup_neardups": _bench_dedup_neardups,
}

DEFAULT_QUERIES = [
    "bench_pr_convergence",
    "bench_dedup_neardups",
    "pagerank_5iter",
    "containment_join",
    "jaccard_prefix_join",
    "lsh_s_curve",
    "minhash_recall",
    "adamic_adar_linkpred",
    "anf_2hop_sizes",
    "four_cycle_count",
    "triangle_counts",
    "edge_embeddedness",
    "minhash_lsh_candidates",
    "connected_components",
    "bfs_distances",
    "kcore_k3",
    "core_numbers",
    "community_agglomeration",
    "random_walks",
    "node2vec_walks",
    "weighted_random_walks",
    "embedding_near_dup_pairs",
    "semantic_dedup_recall",
    "cross_source_leakage",
    "minhash_signature_pairs",
    "path_motif_census",
    "scc_condensation",
]


def plan_text(df) -> str:
    sess = df.sparkSession
    prev = sess.conf.get("spark.sql.adaptive.enabled", "true")
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()
    finally:
        sess.conf.set("spark.sql.adaptive.enabled", prev)


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    names = argv[1:] or DEFAULT_QUERIES
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r10")
    os.makedirs(out_dir, exist_ok=True)
    qs = entry_mod.queries()
    spark = get_spark(
        app_name="graphdb-testing-spark-plans",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    guards = (
        bitsets.MAX_DOCS,
        densegraph.DENSE_NV_MAX,
        prmod.LOCAL_NE_MAX,
        compmod.LOCAL_NE_MAX,
        bfsmod.LOCAL_NE_MAX,
        kcoremod.LOCAL_NE_MAX,
        communitymod.LOCAL_NE_MAX,
        samplingmod.LOCAL_NE_MAX,
        sccmod.LOCAL_NE_MAX,
        simsearchmod.LOCAL_EXACT_ROWS,
    )
    for name in names:
        for mode in ("before", "after"):
            if mode == "before":
                bitsets.MAX_DOCS = 0
                densegraph.DENSE_NV_MAX = 0
                prmod.LOCAL_NE_MAX = 0
                compmod.LOCAL_NE_MAX = 0
                bfsmod.LOCAL_NE_MAX = 0
                kcoremod.LOCAL_NE_MAX = 0
                communitymod.LOCAL_NE_MAX = 0
                samplingmod.LOCAL_NE_MAX = 0
                sccmod.LOCAL_NE_MAX = 0
                simsearchmod.LOCAL_EXACT_ROWS = 0
            else:
                (
                    bitsets.MAX_DOCS,
                    densegraph.DENSE_NV_MAX,
                    prmod.LOCAL_NE_MAX,
                    compmod.LOCAL_NE_MAX,
                    bfsmod.LOCAL_NE_MAX,
                    kcoremod.LOCAL_NE_MAX,
                    communitymod.LOCAL_NE_MAX,
                    samplingmod.LOCAL_NE_MAX,
                    sccmod.LOCAL_NE_MAX,
                    simsearchmod.LOCAL_EXACT_ROWS,
                ) = guards
            fn = EXTRA.get(name) or qs[name]
            txt = plan_text(fn(spark, sf_dir))
            path = os.path.join(out_dir, f"{name}_{mode}.txt")
            with open(path, "w") as fh:
                fh.write(
                    f"-- {name} ({mode}) @ {sf_dir}\n"
                    + (
                        "-- fast-path guards forced OFF to reproduce the "
                        "pre-round-10 plan\n"
                        if mode == "before"
                        else ""
                    )
                    + txt
                )
            print(f"wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
