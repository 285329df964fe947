"""Capture .explain('formatted') plans for the round-11 optimization
targets into plans/r11/.

Round-11's changes live in two places, so two capture modes:

- ``--mode default``: the plan at shipped defaults (guards live).
  Queries whose DEFAULT plan changed this round (new guarded fast
  paths, shared-scan rewires, removed pre-guard jobs).
- ``--mode scale``: every single-task / dense guard forced to 0, so
  the DISTRIBUTED plan is captured — the 100 TB path, where the
  round-11 narrow-id loops changed the exchanges.

"before" files must be produced by running this script from a git
worktree at the round-11 baseline commit (``78be986``) with
``--suffix before``; "after" from HEAD with ``--suffix after``.  The
script itself carries no knowledge of old code.

Usage::

    python scripts/capture_plans_r11.py --suffix after [--mode default]
        [--sf-dir /root/testdata/sf0.01] [--out-dir plans/r11] [query ...]
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
from graphdb_testing_spark.operators import betweenness as bcmod  # noqa: E402
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


def _bench_sv(spark, sf_dir):
    from graphdb_testing_spark import datasets
    from graphdb_testing_spark.operators.components import connected_components

    g = datasets.part_supplier_graph(spark, sf_dir).canonical()
    return connected_components(g.edges)


def _bench_sssp(spark, sf_dir):
    from graphdb_testing_spark import datasets
    from graphdb_testing_spark.operators.bfs import bfs

    g = datasets.part_supplier_graph(spark, sf_dir).canonical()
    return bfs(g.edges, 0)


def _cc_one_round(spark, sf_dir):
    """One UNMATERIALIZED round of connected_components' scale loop —
    the returned DataFrame of the real kernel is checkpoint-truncated
    (11-line plans, round-10 disclosure), so this replica mirrors the
    loop body exactly to expose the per-round exchanges.  It applies
    the narrow-id cast iff the installed operators module has it
    (``util.ids_fit_int32``), so the same script captures the
    round-11 baseline (long keys) from a worktree and HEAD (int keys)
    without version knowledge."""
    from pyspark.sql import functions as F

    from graphdb_testing_spark.operators import util as u
    from graphdb_testing_spark.sources.rmat import rmat_graph

    # RMAT ids are 0..2^scale — the int32-eligible regime the L24
    # bench runs in (the sf fixtures' supplier ids carry a 2^40
    # namespace offset, so the narrow guard correctly stays off there)
    edges = rmat_graph(spark, 15, 8).localCheckpoint()
    ne = edges.count()
    ids = edges.select(F.col("src").alias("id")).distinct().localCheckpoint()
    narrow = hasattr(u, "ids_fit_int32") and u.ids_fit_int32(ids)
    if narrow:
        ids = ids.select(F.col("id").cast("int").alias("id"))
        e_rel = edges.select(
            F.col("src").cast("int").alias("src"),
            F.col("dst").cast("int").alias("dst"),
        )
    else:
        e_rel = edges.select("src", "dst")
    e_self = e_rel.unionAll(
        ids.select(F.col("id").alias("src"), F.col("id").alias("dst"))
    ).coalesce(u.iter_partitions(ne))
    labels = ids.withColumn("label", F.col("id")).localCheckpoint()
    nv = labels.count()
    return (
        e_self.join(u.state_hint(labels, nv), e_self.dst == labels.id)
        .groupBy(F.col("src").alias("id"))
        .agg(F.min("label").alias("label"))
    )


def _pr_one_chunk(spark, sf_dir):
    """Two UNMATERIALIZED rounds of pagerank's scale loop (same
    rationale and narrow-detection as :func:`_cc_one_round`)."""
    from pyspark.sql import functions as F

    from graphdb_testing_spark.operators import util as u
    from graphdb_testing_spark.sources.rmat import rmat_graph

    edges = rmat_graph(spark, 15, 8).localCheckpoint()
    e = edges.select("src", "dst")
    ne = edges.count()
    deg = (
        e.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("degree"))
        .localCheckpoint()
    )
    nv = deg.count()
    base = 0.15 / nv
    narrow = hasattr(u, "ids_fit_int32") and u.ids_fit_int32(deg)
    if narrow:
        deg = deg.select(
            F.col("id").cast("int").alias("id"),
            F.col("degree").cast("int").alias("degree"),
        )
        e = e.select(
            F.col("src").cast("int").alias("src"),
            F.col("dst").cast("int").alias("dst"),
        )
    deg_b = u.state_hint(deg, nv)
    e2 = (
        e.join(deg_b.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", F.col("degree").alias("deg_src"))
        .coalesce(u.iter_partitions(ne))
        .localCheckpoint()
    )
    state = deg.select(
        "id", (F.lit(1.0 / nv) / F.col("degree")).alias("prd"), "degree"
    ).localCheckpoint()
    for _ in range(2):
        state = (
            e2.join(u.state_hint(state, nv), e2.dst == state.id)
            .select(F.col("src").alias("id"), F.col("prd").alias("m"), "deg_src")
            .groupBy("id")
            .agg(
                (
                    (F.lit(base) + F.lit(0.85) * F.sum("m")) / F.first("deg_src")
                ).alias("prd"),
                F.first("deg_src").alias("degree"),
            )
        )
    return state


EXTRA = {
    "bench_pr_convergence": _bench_pr_convergence,
    "bench_sv": _bench_sv,
    "bench_sssp": _bench_sssp,
    "cc_one_round": _cc_one_round,
    "pr_one_chunk": _pr_one_chunk,
}

#: default-mode targets: DEFAULT plan changed in round 11
DEFAULT_QUERIES = [
    "betweenness_4roots",
    "edge_betweenness_4roots",
    "minhash_recall",
    "bench_pr_convergence",  # pre-guard degree job removed
]

#: scale-mode targets: the distributed (above-guard) plan changed
SCALE_QUERIES = [
    "cc_one_round",
    "pr_one_chunk",
    "bench_sssp",
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


def force_scale_path() -> None:
    bitsets.MAX_DOCS = 0
    densegraph.DENSE_NV_MAX = 0
    for m in (prmod, compmod, bfsmod, kcoremod, communitymod, samplingmod,
              sccmod, bcmod):
        m.LOCAL_NE_MAX = 0
    simsearchmod.LOCAL_EXACT_ROWS = 0


def main() -> int:
    argv = sys.argv[1:]

    def _opt(name: str, default: str) -> str:
        if name in argv:
            i = argv.index(name)
            val = argv[i + 1]
            del argv[i : i + 2]
            return val
        return default

    suffix = _opt("--suffix", "after")
    mode = _opt("--mode", "default")
    sf_dir = _opt("--sf-dir", "/root/testdata/sf0.01")
    out_dir = _opt(
        "--out-dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r11",
        ),
    )
    names = argv or (SCALE_QUERIES if mode == "scale" else DEFAULT_QUERIES)
    os.makedirs(out_dir, exist_ok=True)
    qs = entry_mod.queries()
    spark = get_spark(
        app_name="graphdb-testing-spark-plans-r11",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    if mode == "scale":
        force_scale_path()
    for name in names:
        fn = EXTRA.get(name) or qs.get(name)
        if fn is None:
            print(f"skip unknown query {name}", file=sys.stderr)
            continue
        df = fn(spark, sf_dir)
        tag = f"{name}_scale" if mode == "scale" else name
        path = os.path.join(out_dir, f"{tag}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan_text(df))
        print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
