"""Triangle counting and clustering coefficients.

Reference semantics (SURVEY.md §2.5 A2-A3): per-vertex triangle count
``ntri[v]`` = 2 × (#triangles through v) — each triangle is seen from
v once per incident edge-pair orientation in the reference's
wedge-closing scan (``tests/stinger/src/alg/
streaming_clustering_coefficients.c:14-70``); local clustering
coefficient ``ntri[v] / (deg[v] * (deg[v]-1))``; global coefficient
``Σ ntri / Σ deg(deg-1)`` (formulas at ``:268-273``).

Spark-first design: canonicalize to ``src < dst`` once, then one
edge-edge-edge equi-join counts every triangle exactly once
(``(u<v<w)``) — a shuffled join Catalyst plans as sort-merge/shuffled
hash with AQE skew splitting.  Per-vertex counts follow by exploding
each triangle to its three corners — no per-vertex hash probes, no
driver loop.  At 100 TB the canonical-edge table is the only shuffled
relation and degree-skew is handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented_triangles(edges: DataFrame) -> DataFrame:
    """``(a, u, v)`` — every triangle exactly once, apex ``a`` first.

    Scale design: edges are **degree-oriented** (low ``(degree, id)``
    endpoint → high) before the wedge join — the standard
    forward/compact-forward orientation.  Every triangle then has
    exactly one apex (its minimum-order corner), the wedge count drops
    from ``Σ deg²`` to ``Σ outdeg²`` with ``outdeg ≤ O(√m)`` on skewed
    graphs, and no dedup of the triangle triple is needed.
    """
    canon = edges.filter(F.col("src") < F.col("dst")).select("src", "dst").distinct()
    deg = (
        canon.select(F.col("src").alias("id"))
        .unionAll(canon.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    # orientation key: (degree, id) — total order, ties broken by id
    with_keys = (
        canon.join(deg.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("deg", "sdeg")
        .join(deg.withColumnRenamed("id", "dst"), "dst")
        .withColumnRenamed("deg", "ddeg")
    )
    fwd = F.struct(F.col("sdeg"), F.col("src")) < F.struct(F.col("ddeg"), F.col("dst"))
    oriented = with_keys.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("a"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("b"),
        F.when(
            fwd, F.struct(F.col("ddeg").alias("kdeg"), F.col("dst").alias("kid"))
        )
        .otherwise(F.struct(F.col("sdeg").alias("kdeg"), F.col("src").alias("kid")))
        .alias("bkey"),
    ).localCheckpoint()
    # Join strategy: leave BOTH joins to Catalyst/AQE.  Measured at
    # sf0.1 (1.18M edges, 197M triangles): forcing broadcast hash
    # joins on the wedge build + closing probe sides ran 115s vs 47s
    # for the AQE-planned shuffled joins — the shuffle redistributes
    # the Σ outdeg² wedge stream across all cores and AQE's skew
    # splitting breaks up heavy-apex partitions, while the broadcast
    # variant pinned the whole skewed wedge generation onto the scan
    # tasks.  The declarative form IS the fast path here.
    w1 = oriented.select(F.col("a"), F.col("b").alias("u"), F.col("bkey").alias("ukey"))
    w2 = oriented.select(F.col("a"), F.col("b").alias("v"), F.col("bkey").alias("vkey"))
    wedges = w1.join(w2, "a").filter(F.col("ukey") < F.col("vkey"))
    closing = oriented.select(F.col("a").alias("u"), F.col("b").alias("v"))
    return wedges.join(closing, ["u", "v"]).select("a", "u", "v")


def exact_triangle_count(edges: DataFrame, symmetric: bool = True) -> int:
    """Total distinct triangles (each counted ONCE) as a driver int.

    Under the dense guard this is the per-vertex dense row sums / 6
    (each triangle contributes 2 ordered wedges at each of its 3
    corners — exact integers); past the guard it is the oriented
    wedge enumeration's row count.  ``symmetric=False`` accepts a
    canonical ``src < dst`` relation (e.g. a sampled edge set)."""
    from .densegraph import dense_ctx, dense_triangles_per_vertex

    ctx = dense_ctx(edges.select("src", "dst"), symmetric=symmetric)
    if ctx is not None:
        s = (
            dense_triangles_per_vertex(ctx)
            .agg(F.sum("ntri").alias("s"))
            .collect()[0]["s"]
        )
        return int(s or 0) // 6
    # _oriented_triangles canonicalizes (src < dst, distinct) itself,
    # so both symmetric and canonical inputs enumerate correctly
    return _oriented_triangles(edges).count()


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """``(id, ntri)`` with the reference's 2×-per-triangle convention.

    Vertices in no triangle get ``ntri = 0`` (the reference
    initializes the array to zero).  See :func:`_oriented_triangles`
    for the scale design.
    """
    # guarded dense-adjacency fast path (operators/densegraph.py):
    # the sf0.1 user fixture is 1,500 vertices at 70 % density, where
    # the degree-oriented wedge join still materializes 527 M rows for
    # a graph whose packed adjacency is 280 KB — blocked integer
    # matmuls compute the identical counts in-task.  Past DENSE_NV_MAX
    # the wedge join below remains the scale path.
    from .densegraph import dense_ctx, dense_triangles_per_vertex

    ctx = dense_ctx(edges.select("src", "dst"), symmetric=True)
    if ctx is not None:
        return dense_triangles_per_vertex(ctx)
    tri = _oriented_triangles(edges)
    # single pass: explode each triangle to its 3 corners (a 3-way
    # union of projections would re-execute the wedge join 3 times)
    corners = tri.select(F.explode(F.array("a", "u", "v")).alias("id"))
    counts = corners.groupBy("id").agg((2 * F.count("*")).alias("ntri"))
    all_ids = edges.select(F.col("src").alias("id")).distinct()
    return all_ids.join(counts, "id", "left").select(
        "id", F.coalesce("ntri", F.lit(0)).alias("ntri")
    )


def edge_triangle_support(canon: DataFrame) -> DataFrame:
    """``(src, dst, sup)`` — triangles through each canonical
    (``src < dst``, distinct) edge, zero included.  One oriented
    enumeration exploded to its three sides; shared by
    :func:`edge_embeddedness` and the k-truss peeler."""
    # guarded dense-adjacency fast path — same rationale as in
    # :func:`triangles_per_vertex`; emits every canonical edge with
    # its exact support (zeros included) directly
    from .densegraph import dense_ctx, dense_edge_support

    ctx = dense_ctx(canon, symmetric=False)
    if ctx is not None:
        return dense_edge_support(ctx)
    tri = _oriented_triangles(canon)
    side = lambda x, y: F.struct(  # noqa: E731
        F.least(x, y).alias("s"), F.greatest(x, y).alias("d")
    )
    sup = (
        tri.select(
            F.explode(
                F.array(side("a", "u"), side("a", "v"), side("u", "v"))
            ).alias("e")
        )
        .groupBy(F.col("e.s").alias("src"), F.col("e.d").alias("dst"))
        .agg(F.count("*").cast("long").alias("sup"))
    )
    return canon.join(sup, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("sup", F.lit(0)).alias("sup")
    )


def edge_embeddedness(edges: DataFrame) -> DataFrame:
    """``(src, dst, common_neighbors, jaccard)`` per canonical
    (``src < dst``) edge: the number of shared neighbors of the two
    endpoints and the Jaccard similarity of their neighborhoods —
    the per-edge triangle *support*, a standard link-strength /
    link-prediction feature.

    Built on the same degree-oriented triangle enumeration as
    :func:`triangles_per_vertex` (each triangle supports its three
    edges), so the wedge join stays ``Σ outdeg²`` instead of the naive
    ``Σ deg²`` common-neighbor self-join.

    **Jaccard convention — inclusive endpoints**:
    ``common / (deg(u) + deg(v) - common)``, where each endpoint's
    neighborhood still contains the other endpoint (the edge u–v
    exists, so u ∈ N(v) and v ∈ N(u)) — i.e. the union term is 2
    larger than the open-neighborhood Jaccard
    ``|N(u)∩N(v)| / |N(u)∪N(v) \\ {u,v}|``.  This inclusive form is
    deliberate: it equals triangle support over edge degree-union (the
    embeddedness normalization of Marlow et al.), is bounded in
    [0, 1), and the DuckDB oracle (``queries_analytics.py``) computes
    the identical expression.
    """
    canon = edges.filter(F.col("src") < F.col("dst")).select("src", "dst").distinct()
    support = edge_triangle_support(canon).withColumnRenamed(
        "sup", "common_neighbors"
    )
    deg = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    return (
        support
        .join(deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "sdeg"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "ddeg"), "dst")
        .select(
            "src",
            "dst",
            "common_neighbors",
            F.round(
                F.col("common_neighbors")
                / (F.col("sdeg") + F.col("ddeg") - F.col("common_neighbors")),
                6,
            ).alias("jaccard"),
        )
    )


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """``(id, ntri, degree, local_cc)`` per vertex.

    ``local_cc = ntri / (deg * (deg - 1))`` (reference
    ``streaming_clustering_coefficients.c:268-273``); 0 when
    ``deg < 2``.
    """
    ntri = triangles_per_vertex(edges)
    deg = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))
    return ntri.join(deg, "id").select(
        "id",
        "ntri",
        "degree",
        F.when(
            F.col("degree") >= 2,
            F.col("ntri") / (F.col("degree") * (F.col("degree") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("local_cc"),
    )


def global_clustering_coefficient(edges: DataFrame) -> float:
    """``Σ ntri / Σ deg(deg-1)`` over all vertices."""
    cc = clustering_coefficients(edges)
    row = cc.agg(
        F.sum("ntri").alias("num"),
        F.sum(F.col("degree") * (F.col("degree") - 1)).alias("den"),
    ).collect()[0]
    return row["num"] / row["den"] if row["den"] else 0.0


def triangle_delta(edges_after: DataFrame, new_pairs: DataFrame) -> DataFrame:
    """``(id, d_ntri)`` — per-vertex triangle-count increments (2×
    convention) caused by an insert-only batch: the triangles of the
    post-insert graph that contain ≥ 1 new edge, each counted exactly
    once.

    This is the honest incremental algorithm of the reference's
    streaming clustering-coefficient kernel
    (``streaming_clustering_coefficients.c``: per new edge (u,v) the
    update is |N(u) ∩ N(v)|): per new edge, common neighbors in the
    post-insert adjacency; a triangle closed by SEVERAL new edges is
    attributed to its lexicographically smallest new edge (the
    reference's sequential insert order plays the same tie-break
    role).  Cost: one adjacency join per side of the delta —
    O(|delta| · d̄) work, independent of the total triangle count,
    which is the entire point versus recompute.

    ``new_pairs``: undirected ``(u, v)`` with ``u < v``, distinct,
    genuinely absent before the batch (caller anti-joins).
    ``edges_after``: the symmetric post-insert edge table.
    """
    adj = edges_after.select("src", "dst")
    d = new_pairs.select("u", "v").distinct().localCheckpoint()
    # common neighbors of (u, v) in the post-insert graph
    wu = adj.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    wv = adj.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    cand = (
        d.join(wu, "u")
        .join(wv, ["v", "w"])
        .filter((F.col("w") != F.col("u")) & (F.col("w") != F.col("v")))
    )
    # attribute each triangle to its lex-min new edge: drop the
    # candidate if either other side is ALSO a new edge with a
    # smaller (u, v) tuple
    d1 = d.select(F.col("u").alias("x1"), F.col("v").alias("y1"), F.lit(1).alias("n1"))
    d2 = d.select(F.col("u").alias("x2"), F.col("v").alias("y2"), F.lit(1).alias("n2"))
    cand = (
        cand.join(
            d1,
            (F.col("x1") == F.least("u", "w")) & (F.col("y1") == F.greatest("u", "w")),
            "left",
        )
        .join(
            d2,
            (F.col("x2") == F.least("v", "w")) & (F.col("y2") == F.greatest("v", "w")),
            "left",
        )
        .filter(
            (
                F.col("n1").isNull()
                | (
                    F.struct(F.col("x1"), F.col("y1"))
                    > F.struct(F.col("u"), F.col("v"))
                )
            )
            & (
                F.col("n2").isNull()
                | (
                    F.struct(F.col("x2"), F.col("y2"))
                    > F.struct(F.col("u"), F.col("v"))
                )
            )
        )
        .select("u", "v", "w")
    )
    corners = cand.select(F.explode(F.array("u", "v", "w")).alias("id"))
    return corners.groupBy("id").agg((2 * F.count("*")).alias("d_ntri"))
