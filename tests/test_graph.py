"""Graph model: symmetrize, degrees, adjacency, consistency (M7-M11)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_testing_spark.graph import Graph, symmetrize


def test_symmetrize_dedup_weights(spark):
    # parallel duplicates collapse with weight=multiplicity; self-loops drop
    directed = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 1), (3, 3), (2, 4)], "src long, dst long"
    )
    e = symmetrize(directed)
    rows = {(r.src, r.dst): r.wgt for r in e.collect()}
    assert rows == {(1, 2): 3, (2, 1): 3, (2, 4): 1, (4, 2): 1}


def test_degrees_and_counts(spark, path_graph):
    g = Graph(edges=path_graph)
    degs = {r.id: r.degree for r in g.out_degrees().collect()}
    assert degs == {0: 1, 1: 2, 2: 2, 3: 2, 4: 1, 10: 1, 11: 1}
    assert g.num_vertices() == 7
    assert g.num_edges() == 10  # directed count = 2x undirected
    assert g.max_active_vertex() == 11


def test_adjacency_csr_view(spark, path_graph):
    g = Graph(edges=path_graph)
    adj = {r.id: list(r.neighbors) for r in g.adjacency().collect()}
    assert adj[1] == [0, 2]
    assert adj[10] == [11]


def test_consistency_check_passes(spark, bowtie_graph):
    checks = Graph(edges=bowtie_graph).consistency_check()
    assert all(checks.values()), checks


def test_consistency_check_catches_asymmetry(spark):
    bad = spark.createDataFrame([(1, 2, 1)], "src long, dst long, wgt long")
    checks = Graph(edges=bad).consistency_check()
    assert not checks["symmetric"]


def test_has_successor_semi_join(spark, path_graph):
    g = Graph(edges=path_graph)
    pairs = spark.createDataFrame([(0, 1), (0, 4)], "src long, dst long")
    found = {(r.src, r.dst) for r in g.has_successor(pairs).collect()}
    assert found == {(0, 1)}


def test_filtered_traversal_time_predicates(spark):
    e = spark.createDataFrame(
        [(1, 2, 1, 0, 10, 20), (2, 3, 1, 0, 30, 40)],
        "src long, dst long, wgt long, etype long, time_first long, time_recent long",
    )
    g = Graph(edges=e)
    assert g.filtered(modified_after=25).count() == 1
    assert g.filtered(created_before=15).count() == 1
    assert g.filtered(vertices=[1]).count() == 1
