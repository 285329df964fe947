"""Graph data model: DataFrame-pair property graph.

The reference's canonical graph (SURVEY.md §1.1) is an undirected,
weighted, dynamic graph stored as symmetric directed edges with no
self-loops and unique ``(src, dst)`` pairs, weight = multiplicity
(reference ``rmatter/src/rmatter.c:222-291``).  Here that is a plain
DataFrame::

    edges(src LONG, dst LONG, wgt LONG
          [, etype LONG, time_first LONG, time_recent LONG])

and an optional vertex attribute table::

    vertices(id LONG [, vtype LONG, vweight LONG, name STRING])

Vertices otherwise exist implicitly as ``distinct(src)`` (the graph is
symmetric, so ``src`` covers every endpoint) — mirroring the
reference's implicit vertex set via the CSR offset array.

Scale notes
-----------
* ``Graph.canonical`` hash-repartitions edges on ``src`` once; every
  iterative kernel then joins vertex-state against that same
  partitioning, so only the small O(nv) state side shuffles per
  round.
* All invariants (symmetry, dedup, no self-loops) are checked with
  aggregation queries, never driver-side loops — see
  :meth:`Graph.consistency_check`, the analog of
  ``stinger_consistency_check``
  (reference ``tests/stinger/src/core/stinger.c:343-457``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_COLS = ("src", "dst", "wgt")


def symmetrize(directed: DataFrame, weight_col: str = "wgt") -> DataFrame:
    """Undirected closure: add reverse edges, drop self-loops, collapse
    duplicates summing weights.

    Mirrors the generator's canonicalization (reference
    ``rmatter/src/rmatter.c:222-229,247-291``: reverse append →
    self-loop drop → dedup with weight=multiplicity), expressed as
    union + filter + partial-aggregating groupBy (map-side combine is
    free from Catalyst).
    """
    w = F.col(weight_col) if weight_col in directed.columns else F.lit(1)
    base = directed.select("src", "dst", w.cast("long").alias("wgt"))
    return (
        base.unionAll(base.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "wgt"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("wgt").alias("wgt"))
    )


@dataclass
class Graph:
    """Symmetric weighted edge relation + optional vertex attributes."""

    edges: DataFrame
    vertices: DataFrame | None = None
    _cached: bool = field(default=False, repr=False)

    @property
    def spark(self) -> SparkSession:
        return self.edges.sparkSession

    @classmethod
    def from_directed(cls, directed: DataFrame, weight_col: str = "wgt") -> "Graph":
        return cls(edges=symmetrize(directed, weight_col))

    def canonical(self, num_partitions: int | None = None, cache: bool = True) -> "Graph":
        """Return a copy with edges hash-partitioned on ``src`` and cached.

        One shuffle here buys co-partitioned joins for every iterative
        kernel round afterwards (the Spark analog of the reference's
        arrays-indexed-by-vertex layout; SURVEY.md §4
        "co-partitioning for iterative joins").
        """
        n = num_partitions or self.edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
        e = self.edges.repartition(int(n), "src")
        if cache:
            e = e.persist()
        return Graph(edges=e, vertices=self.vertices, _cached=cache)

    def unpersist(self) -> None:
        if self._cached:
            self.edges.unpersist()

    # ------------------------------------------------------------------
    # vertex / degree views (SURVEY.md §2.2 M7, M9, M10)
    # ------------------------------------------------------------------

    def vertex_ids(self) -> DataFrame:
        """Implicit vertex set: every id with ≥1 incident edge."""
        return self.edges.select(F.col("src").alias("id")).distinct()

    def out_degrees(self) -> DataFrame:
        """``(id, degree)`` — on a symmetric graph this is THE degree.

        Reference: ``SELECT src, COUNT(src) FROM edges GROUP BY src``
        (``tests/sqlite/test.c:260``).
        """
        return self.edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))

    def weighted_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col("src").alias("id")).agg(F.sum("wgt").alias("wdegree"))

    def num_vertices(self) -> int:
        return self.vertex_ids().count()

    def num_edges(self) -> int:
        """Directed edge count (2× undirected); ``stinger_total_edges``
        analog (reference ``src/core/stinger.c:278-287``)."""
        return self.edges.count()

    def max_active_vertex(self) -> int:
        """Reference ``stinger_max_active_vertex`` (``stinger.c:181-201``)."""
        row = self.edges.agg(F.greatest(F.max("src"), F.max("dst")).alias("m")).collect()[0]
        return row["m"] if row["m"] is not None else -1

    def num_active_vertices(self) -> int:
        """Reference ``stinger_num_active_vertices`` (``stinger.c:203-218``)."""
        return self.num_vertices()

    def adjacency(self, sort_neighbors: bool = True) -> DataFrame:
        """CSR-shaped view: ``(id, neighbors array<long>, weights array<long>)``.

        The reference's ``stinger_to_sorted_csr``
        (``src/util/stinger-utils.c:439-499``) as a groupBy-collect;
        only materialize when an algorithm genuinely needs the
        adjacency layout (e.g. binary ``.g`` export).
        """
        pair = F.struct(F.col("dst"), F.col("wgt"))
        agg = F.collect_list(pair)
        if sort_neighbors:
            agg = F.sort_array(agg)
        return (
            self.edges.groupBy(F.col("src").alias("id"))
            .agg(agg.alias("nbrs"))
            .select(
                "id",
                F.col("nbrs.dst").alias("neighbors"),
                F.col("nbrs.wgt").alias("weights"),
            )
        )

    # ------------------------------------------------------------------
    # consistency (SURVEY.md §2.2 M11)
    # ------------------------------------------------------------------

    def consistency_check(self) -> dict[str, bool]:
        """Invariant assertions, one aggregation pass each.

        The engine analog of ``stinger_consistency_check`` (reference
        ``tests/stinger/src/core/stinger.c:343-457``): no self-loops,
        no duplicate (src,dst), symmetric (every edge has its
        reverse with equal weight), non-negative weights.
        """
        e = self.edges
        checks: dict[str, bool] = {}
        checks["no_self_loops"] = e.filter(F.col("src") == F.col("dst")).limit(1).count() == 0
        dup = (
            e.groupBy("src", "dst").agg(F.count("*").alias("n")).filter(F.col("n") > 1)
        )
        checks["no_duplicate_edges"] = dup.limit(1).count() == 0
        rev = e.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("wgt").alias("rwgt")
        )
        asym = e.join(rev, ["src", "dst"], "full_outer").filter(
            F.col("wgt").isNull() | F.col("rwgt").isNull() | (F.col("wgt") != F.col("rwgt"))
        )
        checks["symmetric"] = asym.limit(1).count() == 0
        checks["positive_weights"] = e.filter(F.col("wgt") <= 0).limit(1).count() == 0
        return checks

    # ------------------------------------------------------------------
    # scans / traversal API (SURVEY.md §2.3 F1-F6)
    # ------------------------------------------------------------------

    def edges_of_type(self, etype: int) -> DataFrame:
        """``FORALL_EDGES(S, type)`` (reference
        ``include/core/stinger-traversal.h``) — a pruned scan."""
        if "etype" not in self.edges.columns:
            return self.edges
        return self.edges.filter(F.col("etype") == etype)

    def remove_edges_of_type(self, etype: int) -> "Graph":
        """``stinger_remove_all_edges_of_type`` analog (reference
        ``src/core/stinger.c:1065-1090``, M4) — an anti-filter that
        Catalyst pushes into the scan; returns a new Graph (immutable
        relations, like every mutation here)."""
        if "etype" not in self.edges.columns:
            return self
        return Graph(
            edges=self.edges.filter(F.col("etype") != etype),
            vertices=self.vertices,
        )

    def neighbors_of(self, vertex: int) -> DataFrame:
        """``STINGER_FORALL_EDGES_OF_VTX`` analog
        (``stinger-traversal.h:61-77``)."""
        return self.edges.filter(F.col("src") == vertex)

    def successors(self, vertices: DataFrame | None = None) -> DataFrame:
        """Gather copy-out (reference ``stinger_gather_successors``,
        ``include/stinger.h:197-213``)."""
        e = self.edges
        if vertices is not None:
            e = e.join(F.broadcast(vertices.select(F.col("id").alias("src"))), "src", "inner")
        return e.groupBy(F.col("src").alias("id")).agg(
            F.collect_list(F.col("dst")).alias("successors")
        )

    def has_successor(self, pairs: DataFrame) -> DataFrame:
        """Edge-existence semi-join (reference
        ``stinger_has_typed_successor``, ``stinger.h:214-216``).

        ``pairs(src, dst)`` → subset that exists in the graph.
        """
        return pairs.join(self.edges.select("src", "dst"), ["src", "dst"], "left_semi")

    def filtered(
        self,
        vertices: list[int] | None = None,
        etype: int | None = None,
        created_after: int | None = None,
        created_before: int | None = None,
        modified_after: int | None = None,
        modified_before: int | None = None,
    ) -> DataFrame:
        """Composable filtered edge iterator — the reference's
        "query language" (``include/core/stinger-iterator.h:38-68``
        and the ``STINGER_TRAVERSE_EDGES`` macro,
        ``include/stinger.h:297-316``) as a ``.where`` chain, which
        Catalyst pushes into the parquet scan.
        """
        e = self.edges
        if vertices is not None:
            e = e.filter(F.col("src").isin(vertices))
        if etype is not None and "etype" in e.columns:
            e = e.filter(F.col("etype") == etype)
        if created_after is not None:
            e = e.filter(F.col("time_first") > created_after)
        if created_before is not None:
            e = e.filter(F.col("time_first") < created_before)
        if modified_after is not None:
            e = e.filter(F.col("time_recent") > modified_after)
        if modified_before is not None:
            e = e.filter(F.col("time_recent") < modified_before)
        return e
