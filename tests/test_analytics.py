"""Triangles, clustering coefficients, k-core on micro-graphs (A1-A3)."""

from __future__ import annotations

import pytest

from graphdb_testing_spark.operators.kcore import core_numbers, kcore_vertices
from graphdb_testing_spark.operators.triangles import (
    clustering_coefficients,
    global_clustering_coefficient,
    triangles_per_vertex,
)


def test_bowtie_triangles(spark, bowtie_graph):
    # reference convention: ntri[v] = 2 x (#triangles through v)
    ntri = {r.id: r.ntri for r in triangles_per_vertex(bowtie_graph).collect()}
    assert ntri == {0: 2, 1: 2, 2: 4, 3: 2, 4: 2}


def test_bowtie_clustering_coefficients(spark, bowtie_graph):
    cc = {r.id: r.local_cc for r in clustering_coefficients(bowtie_graph).collect()}
    assert cc[0] == pytest.approx(1.0)  # deg 2, one triangle: 2/(2*1)
    assert cc[2] == pytest.approx(4 / (4 * 3))  # hub: deg 4, two triangles
    g = global_clustering_coefficient(bowtie_graph)
    assert g == pytest.approx((2 + 2 + 4 + 2 + 2) / (2 + 2 + 12 + 2 + 2))


def test_triangle_free_graph(spark, path_graph):
    assert triangles_per_vertex(path_graph).filter("ntri != 0").count() == 0


def test_kcore_bridged_cliques(spark, bridged_cliques):
    # K4 members all have core 3; the bridge does not raise it
    three_core = {r.id for r in kcore_vertices(bridged_cliques, 3).collect()}
    assert three_core == {0, 1, 2, 3, 4, 5, 6, 7}
    assert kcore_vertices(bridged_cliques, 4).count() == 0
    cores = {r.id: r.core for r in core_numbers(bridged_cliques).collect()}
    assert cores == {v: 3 for v in range(8)}


def test_kcore_path(spark, path_graph):
    # a path is 1-core everywhere; 2-core empty
    assert kcore_vertices(path_graph, 1).count() == 7
    assert kcore_vertices(path_graph, 2).count() == 0


def test_edge_embeddedness_triangle_with_pendant(spark):
    from tests.conftest import edges_df

    from graphdb_testing_spark.operators.triangles import edge_embeddedness

    g = edges_df(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    rows = {(r.src, r.dst): r for r in edge_embeddedness(g).collect()}
    assert rows[(0, 1)].common_neighbors == 1
    assert rows[(0, 1)].jaccard == pytest.approx(1 / 3)
    assert rows[(0, 2)].common_neighbors == 1
    assert rows[(0, 2)].jaccard == pytest.approx(0.25)
    assert rows[(2, 3)].common_neighbors == 0
    assert rows[(2, 3)].jaccard == 0.0
    assert len(rows) == 4
