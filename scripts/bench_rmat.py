"""Kernel benchmark on the reference's own graph scales.

Generates the R-MAT graph the reference benchmarks (SCALE 10/15/20/24
= tiny/small/medium/large, edge factor 8; ``large22`` is the halfway
SCALE-22 step), runs the four kernels with the reference's
parameters, and prints one RSLT-shaped JSON line directly comparable
with ``BASELINE.md`` rows (update count: 100K actions for tiny/small,
1M for medium/large, like ``run_tests.sh``; the reference's large
results live in ``results/*.{stinger,giraph,pegasus}.large``).

Resumable: the built graph is persisted to parquet once per tier
(under ``$SPARK_GRAFT_BENCH_CACHE``, default ``.bench_cache/``), and
each kernel's timing+invariants are checkpointed to a per-tier
``state.json`` as soon as it finishes — a crashed multi-hour large
run resumes from the cached graph and skips completed kernels.
``--fresh`` discards both and reruns everything.

Usage::

    python scripts/bench_rmat.py [tiny|small|medium|large22|large] [--fresh]
        [--kernels build,sv,...]   # run only these (others keep state)
        [--redo sv,...]            # clear these from state, re-measure

``--kernels``/``--redo`` exist for attribution sessions (round-9
verdict: CC@SCALE-24 needed re-measuring fresh-after-build vs
cold-resumed without paying for PageRank + the trickle stream every
time); a partial run prints the same JSON with the missing kernels
absent and skips the full-suite invariant gate for keys it didn't
compute.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bench import (  # noqa: E402 (repo-root bench.py)
    calibrate_membw,
    calibrate_scan,
    calibrate_shuffle,
    ensure_scan_probe,
)
from graphdb_testing_spark.operators.bfs import bfs  # noqa: E402
from graphdb_testing_spark.operators.components import (  # noqa: E402
    connected_components,
)
from graphdb_testing_spark.operators.pagerank import pagerank  # noqa: E402
from graphdb_testing_spark.operators.updates import (  # noqa: E402
    apply_actions,
    apply_actions_auto,
    init_edge_store,
    read_edge_store,
)
from graphdb_testing_spark.session import get_spark  # noqa: E402
from graphdb_testing_spark.sources.rmat import (  # noqa: E402
    rmat_actions,
    rmat_graph,
)

SCALES = {
    "tiny": (10, 100_000),
    "small": (15, 100_000),
    "medium": (20, 1_000_000),
    "large22": (22, 1_000_000),
    "large": (24, 1_000_000),  # the reference's large graph: 2^24 v, 134M dir. edges
}

#: Expected kernel invariants per size (seeded R-MAT → fully
#: deterministic).  The bench doubles as a scale regression gate: a
#: kernel that silently breaks (wrong component count, unreached BFS
#: frontier, leaked PageRank mass, bad merge) fails loudly here, not
#: just slowly.  Values pinned from verified runs (CC/BFS
#: cross-checked against the DuckDB recursive-CTE oracle at tiny).
EXPECTED: dict[str, dict[str, int]] = {
    "tiny": {
        "nv": 1009,
        "ne": 12162,
        "n_components": 3,
        "bfs_reached": 1005,
        "edges_after_update": 180828,
    },
    "small": {
        "nv": 31000,
        "ne": 475872,
        "n_components": 71,
        "bfs_reached": 30853,
        "edges_after_update": 663426,
    },
    "medium": {},
    "large22": {
        "nv": 3_738_117,
        "ne": 65_742_380,
        "n_components": 20_174,
        "bfs_reached": 3_695_726,
        "edges_after_update": 67_617_182,
    },
    "large": {},
}


def check_invariants(size: str, meta: dict, pr_sum: float) -> list[str]:
    errs = []
    # Σpr = 1 is analytic (mass conservation incl. dangling handling)
    if abs(pr_sum - 1.0) > 1e-6:
        errs.append(f"pagerank mass leaked: sum(pr)={pr_sum!r}")
    for key, want in EXPECTED.get(size, {}).items():
        if key not in meta:
            continue  # partial --kernels run: that kernel didn't execute
        got = meta.get(key)
        if got != want:
            errs.append(f"{key}: got {got}, expected {want}")
    # trickle stream must converge to the bulk merge BY CONTENT
    if "trickle_sig" in meta and meta["trickle_sig"] != meta["trickle_bulk_sig"]:
        errs.append(
            f"trickle/bulk content mismatch: {meta['trickle_sig']} != "
            f"{meta['trickle_bulk_sig']}"
        )
    return errs


def main() -> None:
    argv = sys.argv[1:]
    args = [a for a in argv if not a.startswith("--")]
    fresh = "--fresh" in argv

    def _flag(name: str) -> set[str] | None:
        if name in argv:
            return set(argv[argv.index(name) + 1].split(","))
        return None

    ALL_KERNELS = ("build", "sv", "sssp", "pr", "update", "update_trickle")
    wanted = _flag("--kernels") or set(ALL_KERNELS)
    redo = _flag("--redo") or set()
    # a --kernels arg consumed its value from positional args
    args = [a for a in args if a in SCALES]
    size = args[0] if args else "small"
    scale, na = SCALES[size]

    cache_root = os.environ.get("SPARK_GRAFT_BENCH_CACHE", ".bench_cache")
    tier_dir = os.path.join(cache_root, f"rmat_s{scale}_ef8_seed1")
    graph_path = os.path.join(tier_dir, "edges.parquet")
    state_path = os.path.join(tier_dir, "state.json")
    if fresh and os.path.isdir(tier_dir):
        shutil.rmtree(tier_dir)
    os.makedirs(tier_dir, exist_ok=True)

    state: dict = {}
    if os.path.isfile(state_path):
        with open(state_path) as fh:
            state = json.load(fh)

    def save_state() -> None:
        tmp = state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, state_path)

    # shuffle partitions sized like the iterative kernels (~250k edge
    # rows per task): at SCALE 24 the symmetrize groupBy shuffles 268M
    # rows, and 32 partitions of 8M+ rows each exhaust the execution
    # pool (measured: UNABLE_TO_ACQUIRE_MEMORY in the build stage).
    # Same formula a 1000-executor cluster would use — this is the
    # scale path, not a local workaround.
    ne_raw = 2 * (2**scale) * 8
    sp = max(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), ne_raw // 250_000)
    # heap sized to the tier: the checkpointed edge table lives in the
    # block manager for the whole suite, and 32 concurrent hash
    # aggregates share the execution pool — SCALE 24 OOM'd the 48g
    # default mid-BFS (measured), so give the large tiers the host's
    # headroom.  On a real cluster this is per-executor memory, set by
    # the same |E|-proportional formula.
    heap_g = max(48, min(100, ne_raw // 2_800_000))
    env_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env_mem is not None:
        # a pre-exported value silently overrides the computed heap;
        # warn when it's smaller so a stale 48g doesn't reintroduce
        # the measured SCALE-24 OOM (ADVICE r4)
        try:
            env_g = int(env_mem.lower().rstrip("g"))
        except ValueError:
            env_g = None
        if env_g is not None and env_g < heap_g:
            print(
                f"WARNING: SPARK_GRAFT_DRIVER_MEM={env_mem} overrides the "
                f"computed {heap_g}g for tier '{size}' — risk of OOM; unset "
                "it to use the tier formula",
                file=sys.stderr,
            )
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{heap_g}g")
    extra_conf = {"spark.ui.showConsoleProgress": "false"}
    # attribution knob (round-9 CC post-mortem): SPARK_GRAFT_AQE_SKEW=false
    # reruns a kernel with AQE skew-join handling off, isolating it as a
    # regime candidate without touching the default config
    aqe_skew = os.environ.get("SPARK_GRAFT_AQE_SKEW")
    if aqe_skew is not None:
        extra_conf["spark.sql.adaptive.skewJoin.enabled"] = aqe_skew
    spark = get_spark(
        app_name=f"bench-rmat-{size}",
        shuffle_partitions=min(sp, 2048),
        extra_conf=extra_conf,
    )

    t: dict[str, float] = state.get("t", {})
    meta: dict = state.get("meta", {})
    probes: dict[str, float] = state.get("probes", {})
    scan_probes: dict[str, float] = state.get("scan_probes", {})
    state["t"], state["meta"], state["probes"] = t, meta, probes
    state["scan_probes"] = scan_probes
    for k in redo:
        # update_trickle carries a sibling timing key
        for key in (k, "update_trickle_small" if k == "update_trickle" else k):
            t.pop(key, None)
        probes.pop(k, None)
        scan_probes.pop(k, None)

    def want(kernel: str) -> bool:
        return kernel in wanted and kernel not in t

    # Per-kernel ambient adjudication (round-8 verdict task 1): the
    # same fixed-work join+agg+shuffle probe bench.py runs per rep
    # (``bench.py:calibrate_shuffle``) runs here immediately AFTER
    # each kernel, in the host state that kernel just experienced.  A
    # tier-level swing divides out: kernel and probe moving together
    # is host drift; kernel moving alone is a plan regression.
    n_threads = spark.sparkContext.defaultParallelism

    # fixed-work parquet-scan probe rides next to the shuffle probe
    # (round-9 verdict: the shuffle probe synthesizes input and never
    # touches disk, so a cold-I/O regime was invisible — kernel vs
    # BOTH probes now separates plan regression / CPU contention /
    # I/O regime).  The probe file is shared across tiers and stable.
    scan_path = os.path.join(cache_root, "scan_probe.parquet")
    probe_existed = os.path.isfile(os.path.join(scan_path, "_SUCCESS"))
    ensure_scan_probe(spark, scan_path)

    membw_probes: dict[str, float] = state.get("membw_probes", {})
    state["membw_probes"] = membw_probes
    for k in redo:
        membw_probes.pop(k, None)

    def probe(kernel: str) -> None:
        probes[kernel] = calibrate_shuffle(spark, n_threads)
        scan_probes[kernel] = calibrate_scan(spark, scan_path)
        membw_probes[kernel] = calibrate_membw()

    # entry-regime scan: taken FIRST so a cold page cache is visible
    # before any kernel warms it (meaningless when ensure_scan_probe
    # just wrote the file — flagged so)
    scan_probes["session_entry"] = calibrate_scan(spark, scan_path)
    if not probe_existed:
        scan_probes["session_entry_hot_from_create"] = True

    calibrate_shuffle(spark, n_threads)  # JIT/codegen warmup, untimed

    graph_ready = os.path.isfile(os.path.join(graph_path, "_SUCCESS"))
    if "build" not in t or not graph_ready:
        t0 = time.time()
        edges = rmat_graph(spark, scale, 8)
        # persist once: the parquet copy is both the resume point for
        # a crashed run and the timed artifact (writing it IS part of
        # a bulk build at cluster scale)
        edges.write.mode("overwrite").parquet(graph_path)
        edges = spark.read.parquet(graph_path).localCheckpoint()
        meta["ne"] = edges.count()  # directed (symmetrized) edge count
        meta["nv"] = edges.select("src").distinct().count()
        t["build"] = round(time.time() - t0, 3)
        probe("build")
        save_state()
    else:
        t0 = time.time()
        edges = spark.read.parquet(graph_path).localCheckpoint()
        n = edges.count()
        assert n == meta.get("ne", n), "cached graph/state mismatch — rerun --fresh"
        meta["ne"] = n
        print(
            f"resume: reused cached graph ({n} edges, "
            f"load {time.time() - t0:.1f}s); kernels done: "
            f"{sorted(set(t) - {'build'})}",
            file=sys.stderr,
        )

    if want("sv"):
        t0 = time.time()
        labels = connected_components(edges)
        meta["n_components"] = labels.select("label").distinct().count()
        labels.unpersist()
        t["sv"] = round(time.time() - t0, 3)
        probe("sv")
        save_state()

    if want("sssp"):
        t0 = time.time()
        dist = bfs(edges, 0)
        meta["bfs_reached"] = dist.count()
        dist.unpersist()
        t["sssp"] = round(time.time() - t0, 3)
        probe("sssp")
        save_state()

    if want("pr"):
        t0 = time.time()
        pr = pagerank(edges)
        meta["pr_sum"] = pr.agg(F.sum("pr").alias("s")).collect()[0]["s"]
        pr.unpersist()
        t["pr"] = round(time.time() - t0, 3)
        probe("pr")
        save_state()

    if want("update"):
        t0 = time.time()
        acts = rmat_actions(spark, scale, na)
        merged = apply_actions(edges, acts)
        meta["edges_after_update"] = merged.count()
        t["update"] = round(time.time() - t0, 3)
        probe("update")
        save_state()

    # Trickle regime (round-8 verdict task 3): the reference's update
    # metric is a STREAM — its loop feeds small batches continuously
    # (``binary_stream.c:54-85``, ``main.c:165-204``), not one bulk
    # merge.  Split the SAME na actions into nb seq-contiguous batches
    # and drive each through apply_actions_auto against the stored
    # table, logging the picker's per-batch regime choice.  batch_delta
    # is the exact sequential-replay fixpoint per key, so consecutive
    # sub-batches applied in seq order converge to the single bulk
    # merge — verified below by content signature, not assumed.
    if want("update_trickle"):
        nb = int(os.environ.get("SPARK_GRAFT_TRICKLE_BATCHES", "20"))
        store = os.path.join(tier_dir, "trickle_store")
        shutil.rmtree(store, ignore_errors=True)
        init_edge_store(edges, store, table_rows=meta["ne"])  # untimed setup
        acts = rmat_actions(spark, scale, na).localCheckpoint()
        acts.count()

        def stream(lo: int, hi: int, batches: int):
            """Feed actions seq∈[lo,hi) through apply_actions_auto in
            ``batches`` seq-contiguous sub-batches; returns (sec,
            regime list, per-stage seconds summed over pruned
            batches)."""
            per = (hi - lo + batches - 1) // batches
            regimes: list[str] = []
            stage_tot: dict[str, float] = {}
            t0 = time.time()
            for i in range(batches):
                batch = acts.filter(
                    (F.col("seq") >= lo + i * per)
                    & (F.col("seq") < min(lo + (i + 1) * per, hi))
                )
                st: dict = {}
                _, strategy = apply_actions_auto(
                    spark, batch, store_path=store, stats=st
                )
                regimes.append(strategy)
                for k, v in st.get("pruned", {}).get("stage_s", {}).items():
                    stage_tot[k] = round(stage_tot.get(k, 0.0) + v, 3)
            return round(time.time() - t0, 3), regimes, stage_tot

        # two stream granularities over ONE store, one sequential
        # history: the reference's trickle regime (tiny batches, where
        # the picker's pruned path earns its 13.5x) on the first 1000
        # actions, then the bulk-ish regime (na/nb-action batches,
        # where full coverage makes rewrite the right call) on the
        # rest.  Final store content = sequential replay of ALL na
        # actions = one bulk merge, checked by signature below.
        n_small = min(1000, na // 10)
        t_small, reg_small, stages_small = stream(0, n_small, nb)
        t["update_trickle_small"] = t_small
        meta["trickle_small_actions"] = n_small
        meta["trickle_small_regimes"] = {
            r: reg_small.count(r) for r in set(reg_small)
        }
        if stages_small:  # fixed-cost attribution of the pruned regime
            meta["trickle_small_stage_s"] = stages_small
        t_big, reg_big, stages_big = stream(n_small, na, nb)
        t["update_trickle"] = t_big
        meta["trickle_batches"] = nb
        meta["trickle_regimes"] = {r: reg_big.count(r) for r in set(reg_big)}
        if stages_big:
            meta["trickle_stage_s"] = stages_big

        # content signature vs the single bulk merge (untimed check)
        def _sig(df):
            r = df.agg(
                F.count("*").alias("n"),
                F.sum(
                    F.pmod(F.xxhash64("src", "dst", "wgt"), F.lit(1 << 30))
                ).alias("h"),
            ).collect()[0]
            return [r["n"], r["h"]]

        bulk = apply_actions(edges, acts)  # (src, dst, wgt)
        meta["trickle_sig"] = _sig(read_edge_store(spark, store))
        meta["trickle_bulk_sig"] = _sig(bulk)
        probe("update_trickle")
        save_state()
        shutil.rmtree(store, ignore_errors=True)

    # partial (--kernels) runs check only what they computed: pr mass
    # needs a pr run in state, counts need their kernel's meta key
    pr_sum = meta.get("pr_sum", 1.0)
    errs = check_invariants(size, meta, pr_sum)
    print(
        json.dumps(
            {
                "type": "spark-graft",
                "size": size,
                "nv": meta.get("nv"),
                "ne": meta["ne"],
                "results": t,
                "na": na,
                "update_eps": (
                    round(na / t["update"], 1) if t.get("update") else None
                ),
                "trickle_eps": (
                    round(
                        (na - meta.get("trickle_small_actions", 0))
                        / t["update_trickle"],
                        1,
                    )
                    if t.get("update_trickle")
                    else None
                ),
                "trickle_small_eps": (
                    round(
                        meta["trickle_small_actions"]
                        / t["update_trickle_small"],
                        1,
                    )
                    if t.get("update_trickle_small")
                    else None
                ),
                "meta": meta,
                # fixed-work join+agg+shuffle probe (bench.py contract)
                # run right after each kernel — the ambient adjudicator
                "probes": probes,
                # fixed-work parquet-scan probe (disk/page-cache regime
                # the shuffle probe can't see — round-9 CC post-mortem)
                "scan_probes": scan_probes,
                # single-thread STREAM-like GB/s (round-10 CC
                # post-mortem: the probe axis the others lack)
                "membw_probes": membw_probes,
                "invariants": "FAIL: " + "; ".join(errs) if errs else "ok",
            }
        )
    )
    if errs:
        raise SystemExit(f"kernel invariant regression ({size}): {errs}")


if __name__ == "__main__":
    main()
