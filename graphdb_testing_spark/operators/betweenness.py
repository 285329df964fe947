"""Approximate betweenness centrality — Brandes with sampled roots.

Reference (``src/alg/static_betweenness_centrality.c:56-180``): per
sampled root, a BFS accumulating path counts ``sigma``, then a
reverse-order dependency sweep ``delta[p] += (σ_p/σ_c)(1+δ_c)``;
per-root results are summed (thread-parallel over roots with a final
reduction, ``:33-40``).

Spark-first design: instead of one job chain per root, ALL roots run
simultaneously in one vertex-state DataFrame keyed by ``(root, id)``
— each BFS level is a single join + aggregate for the whole root
batch, so the job count is O(diameter), not O(roots × diameter).
The backward sweep walks the stored level frontiers deep→shallow the
same way.  Sampled roots ≈ the reference's approximation; exact BC =
every vertex as root.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bfs import _np_edges
from .util import local_input, state_hint

#: edge-row bound for the single-task fast path (~16 B/row ⇒ ≤128 MB
#: in one task); past it the all-roots DataFrame sweep runs
LOCAL_NE_MAX = 8_000_000

#: bound on |roots| × |V| state rows for the fast path (same bound as
#: the multi-source BFS kernel)
LOCAL_STATE_MAX = 64_000_000


def _local_brandes(
    e: DataFrame,
    roots: list[int],
    max_depth: int,
    edge_mode: bool,
) -> DataFrame:
    """Single-Arrow-task multi-root Brandes (round-11, guide §4.2).

    Float discipline (the round-10 verdict's condition for attempting
    this): forward ``sigma`` sums are integer-valued doubles — exact in
    any order up to 2^53 paths; the backward dependency sweep
    accumulates per-parent terms with ``np.add.at`` over the (src,
    dst)-lexsorted edge array and roots in ascending order, so the
    fold order is FIXED (independent of input partitioning), the same
    determinism contract as ``_local_pagerank``.  Final rounding uses
    the shortest-repr BigDecimal HALF_UP rule (= Spark ``F.round``).
    Parity with the DataFrame sweep is asserted at 6 dp by
    tests/test_betweenness_local.py on multi-component fixtures and by
    the sf0.01/sf0.1 oracle runs.
    """
    rts = [int(r) for r in roots]
    md = int(max_depth)

    def run(batches):
        import numpy as np
        import pandas as pd
        from decimal import ROUND_HALF_UP, Decimal

        ids, si, di = _np_edges(batches)
        n = ids.size
        order = np.lexsort((di, si))
        si_, di_ = si[order], di[order]
        six = Decimal("1E-6")

        def r6(x: float) -> float:
            return float(
                Decimal(repr(float(x))).quantize(six, rounding=ROUND_HALF_UP)
            )

        bc = np.zeros(n, dtype=np.float64)
        appears = np.zeros(n, dtype=bool)
        if edge_mode:
            # canonical directed-edge key per lexsorted edge row
            ekey = (
                np.minimum(si_, di_).astype(np.int64) * n
                + np.maximum(si_, di_)
            )
            uniq_keys, einv = np.unique(ekey, return_inverse=True)
            ebc = np.zeros(uniq_keys.size, dtype=np.float64)
            e_hit = np.zeros(uniq_keys.size, dtype=bool)
        for r in rts:
            pos = np.searchsorted(ids, r)
            if pos >= n or ids[pos] != r:
                continue  # root absent from the vertex set
            dist = np.full(n, -1, dtype=np.int64)
            sigma = np.zeros(n, dtype=np.float64)
            dist[pos] = 0
            sigma[pos] = 1.0
            depth = 0
            while depth < md:
                depth += 1
                mask = dist[si_] == depth - 1
                if not mask.any():
                    depth -= 1
                    break
                nsig = np.zeros(n, dtype=np.float64)
                np.add.at(nsig, di_[mask], sigma[si_[mask]])
                new = (nsig > 0) & (dist < 0)
                if not new.any():
                    depth -= 1
                    break
                dist[new] = depth
                sigma[new] = nsig[new]
            # backward dependency sweep, deepest level first
            delta = np.zeros(n, dtype=np.float64)
            for d in range(depth, 0, -1):
                m = (dist[si_] == d - 1) & (dist[di_] == d)
                if not m.any():
                    continue
                p, c = si_[m], di_[m]
                term = (sigma[p] / sigma[c]) * (1.0 + delta[c])
                np.add.at(delta, p, term)
                if edge_mode:
                    ei = einv[m]
                    np.add.at(ebc, ei, term)
                    e_hit[ei] = True
            reached = dist >= 0
            reached[pos] = False  # Brandes: v != s
            bc[reached] += delta[reached]
            appears |= reached
        if edge_mode:
            u = (uniq_keys[e_hit] // n).astype(np.int64)
            v = (uniq_keys[e_hit] % n).astype(np.int64)
            yield pd.DataFrame(
                {
                    "u": ids[u],
                    "v": ids[v],
                    "bc": [r6(x) for x in ebc[e_hit]],
                }
            ).astype({"u": "int64", "v": "int64", "bc": "float64"})
        else:
            yield pd.DataFrame(
                {
                    "id": ids[appears],
                    "bc": [r6(x) for x in bc[appears]],
                }
            ).astype({"id": "int64", "bc": "float64"})

    schema = "u long, v long, bc double" if edge_mode else "id long, bc double"
    return local_input(e).coalesce(1).mapInPandas(run, schema)


def betweenness(
    edges: DataFrame,
    roots: list[int],
    max_depth: int = 64,
) -> DataFrame:
    """``(id, bc)`` — summed dependency scores over the given roots.

    Matches the reference's accumulation semantics: per root, every
    non-root vertex gains ``delta[v]``; no normalization, no halving
    (the reference treats the symmetric edge relation as a directed
    graph both ways, as we do).
    """
    from .util import iter_partitions

    spark = edges.sparkSession
    e = edges.select("src", "dst")
    # constant relation, re-read every level of both sweeps:
    # right-size (~250k edge rows/task) and materialize once
    ne = e.count()
    if ne <= LOCAL_NE_MAX and len(roots) * ne <= LOCAL_STATE_MAX:
        # guarded single-task fast path (round-11): per-level cost at
        # sf0.1 is scheduling for both sweeps (~2·diameter jobs);
        # sigma is integer-exact and the delta fold order is fixed —
        # see _local_brandes.  Cluster-scale graphs keep the
        # all-roots-in-one-state DataFrame sweep below.
        return _local_brandes(e, roots, max_depth, edge_mode=False)
    e = e.coalesce(iter_partitions(ne)).localCheckpoint()
    # per-root state is bounded by nv rows per root; checkpointed
    # state carries no Catalyst stats, so hint sizes explicitly
    nv = e.select("src").distinct().count()
    est = nv * len(roots)

    frontier = spark.createDataFrame(
        [(int(r), int(r), 0, 1.0) for r in roots],
        "root long, id long, dist int, sigma double",
    ).localCheckpoint()
    levels = [frontier]
    visited = frontier.select("root", "id").localCheckpoint()
    depth = 0
    while depth < max_depth:
        depth += 1
        nxt = (
            e.join(state_hint(frontier, est), e.src == frontier.id)
            .groupBy("root", F.col("dst").alias("id"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(state_hint(visited, est), ["root", "id"], "left_anti")
            .withColumn("dist", F.lit(depth).cast("int"))
            .select("root", "id", "dist", "sigma")
            .localCheckpoint()
        )
        if nxt.count() == 0:
            break
        levels.append(nxt)
        visited = visited.unionAll(nxt.select("root", "id")).localCheckpoint()
        frontier = nxt

    # backward dependency sweep, deepest level first
    deltas: DataFrame | None = None  # rows (root, id, sigma, delta) at processed levels
    child = levels[-1].withColumn("delta", F.lit(0.0))
    acc = child.select("root", "id", "delta")
    for lvl in range(len(levels) - 2, -1, -1):
        parents = levels[lvl]
        c = child.select(
            F.col("root").alias("c_root"),
            F.col("id").alias("c_id"),
            F.col("sigma").alias("c_sigma"),
            F.col("delta").alias("c_delta"),
        )
        contrib = (
            state_hint(parents, est).join(e, parents.id == e.src)
            .join(
                state_hint(c, est),
                (F.col("dst") == F.col("c_id")) & (F.col("root") == F.col("c_root")),
            )
            .groupBy("root", "id")
            .agg(
                F.sum(
                    (F.col("sigma") / F.col("c_sigma")) * (F.lit(1.0) + F.col("c_delta"))
                ).alias("dep")
            )
        )
        child = (
            parents.join(contrib, ["root", "id"], "left")
            .select(
                "root",
                "id",
                "dist",
                "sigma",
                F.coalesce("dep", F.lit(0.0)).alias("delta"),
            )
            .localCheckpoint()
        )
        acc = acc.unionAll(child.select("root", "id", "delta"))
    deltas = acc

    return (
        deltas.filter(F.col("id") != F.col("root"))  # Brandes: v != s
        .groupBy("id")
        .agg(F.round(F.sum("delta"), 6).alias("bc"))
    )


def sample_roots(edges: DataFrame, n: int, seed: int = 1) -> list[int]:
    """Deterministic root sample: the n vertices with the smallest
    ``xxhash64(id, seed)`` — uniform over the vertex set,
    reproducible across runs and engines."""
    ids = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("h", F.xxhash64("id", F.lit(seed)))
        .orderBy("h")
        .limit(n)
        .collect()
    )
    return [r.id for r in ids]


def edge_betweenness(
    edges: DataFrame,
    roots: list[int],
    max_depth: int = 64,
) -> DataFrame:
    """``(u, v, bc)`` per canonical (``u < v``) undirected edge — the
    Brandes edge-dependency sums over the given roots (the
    Girvan–Newman edge score).  Same all-roots-in-one-state design as
    :func:`betweenness`: per root, the contribution of DAG edge
    ``p → c`` is ``(σ_p/σ_c)(1 + δ_c)``; summing over roots and both
    BFS orientations gives the undirected score.  Forward sweep is
    identical; the backward sweep emits its per-edge terms *before*
    the vertex aggregation instead of after, so the extra cost over
    vertex BC is one canonical-pair aggregation."""
    from .util import iter_partitions

    spark = edges.sparkSession
    e = edges.select("src", "dst")
    ne = e.count()
    if ne <= LOCAL_NE_MAX and len(roots) * ne <= LOCAL_STATE_MAX:
        # guarded single-task fast path (round-11) — see _local_brandes
        return _local_brandes(e, roots, max_depth, edge_mode=True)
    e = e.coalesce(iter_partitions(ne)).localCheckpoint()
    nv = e.select("src").distinct().count()
    est = nv * len(roots)

    frontier = spark.createDataFrame(
        [(int(r), int(r), 0, 1.0) for r in roots],
        "root long, id long, dist int, sigma double",
    ).localCheckpoint()
    levels = [frontier]
    visited = frontier.select("root", "id").localCheckpoint()
    depth = 0
    while depth < max_depth:
        depth += 1
        nxt = (
            e.join(state_hint(frontier, est), e.src == frontier.id)
            .groupBy("root", F.col("dst").alias("id"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(state_hint(visited, est), ["root", "id"], "left_anti")
            .withColumn("dist", F.lit(depth).cast("int"))
            .select("root", "id", "dist", "sigma")
            .localCheckpoint()
        )
        if nxt.count() == 0:
            break
        levels.append(nxt)
        visited = visited.unionAll(nxt.select("root", "id")).localCheckpoint()
        frontier = nxt

    child = levels[-1].withColumn("delta", F.lit(0.0))
    edge_acc: DataFrame | None = None
    for lvl in range(len(levels) - 2, -1, -1):
        parents = levels[lvl]
        c = child.select(
            F.col("root").alias("c_root"),
            F.col("id").alias("c_id"),
            F.col("sigma").alias("c_sigma"),
            F.col("delta").alias("c_delta"),
        )
        terms = (
            state_hint(parents, est)
            .join(e, parents.id == e.src)
            .join(
                state_hint(c, est),
                (F.col("dst") == F.col("c_id")) & (F.col("root") == F.col("c_root")),
            )
            .select(
                "root",
                "id",
                F.col("c_id").alias("cid"),
                (
                    (F.col("sigma") / F.col("c_sigma"))
                    * (F.lit(1.0) + F.col("c_delta"))
                ).alias("dep"),
            )
            .localCheckpoint()
        )
        epart = terms.select(
            F.least("id", "cid").alias("u"),
            F.greatest("id", "cid").alias("v"),
            "dep",
        )
        edge_acc = epart if edge_acc is None else edge_acc.unionAll(epart)
        contrib = terms.groupBy("root", "id").agg(F.sum("dep").alias("dep"))
        child = (
            parents.join(contrib, ["root", "id"], "left")
            .select(
                "root",
                "id",
                "dist",
                "sigma",
                F.coalesce("dep", F.lit(0.0)).alias("delta"),
            )
            .localCheckpoint()
        )

    if edge_acc is None:
        return spark.createDataFrame([], "u long, v long, bc double")
    return edge_acc.groupBy("u", "v").agg(F.round(F.sum("dep"), 6).alias("bc"))
