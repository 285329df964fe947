"""Link prediction (Adamic–Adar) and label propagation on
micro-graphs with hand-computed expectations."""

from __future__ import annotations

import math

from graphdb_testing_spark.operators.labelprop import label_propagation
from graphdb_testing_spark.operators.linkpred import adamic_adar
from tests.conftest import edges_df

MICRO = round(1e6 / math.log(2))  # one degree-2 common neighbor


def test_adamic_adar_square(spark):
    # C4 cycle 0-1-2-3-0: diagonals are the only non-adjacent pairs,
    # each sharing both degree-2 corners
    g = edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    out = {(r.u, r.v): r for r in adamic_adar(g).collect()}
    assert set(out) == {(0, 2), (1, 3)}
    for r in out.values():
        assert r.common_neighbors == 2
        assert r.aa_score_micro == 2 * MICRO


def test_adamic_adar_excludes_existing_edges_and_hubs_weigh_less(spark):
    # triangle 0-1-2 plus pendant 3-2: (0,1) is an edge -> excluded;
    # (0,3) and (1,3) share only hub 2 (degree 3)
    g = edges_df(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    out = {(r.u, r.v): r for r in adamic_adar(g).collect()}
    assert (0, 1) not in out
    hub_term = round(1e6 / math.log(3))
    assert out[(0, 3)].aa_score_micro == hub_term < MICRO
    assert out[(1, 3)].common_neighbors == 1
    # degree cap below the hub's degree drops hub-only pairs
    assert adamic_adar(g, max_center_degree=2).filter("v = 3").count() == 0


def test_label_propagation_one_round(spark):
    # triangle 0-1-2 with pendant 3-2; neighbor-majority with
    # min-label tie-break after one synchronous round
    g = edges_df(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    labels = {r.id: r.label for r in label_propagation(g, rounds=1).collect()}
    assert labels == {0: 1, 1: 0, 2: 0, 3: 2}


def test_label_propagation_converges_on_disjoint_cliques(spark):
    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    labels = {r.id: r.label for r in label_propagation(
        edges_df(spark, tri1 + tri2), rounds=4).collect()}
    assert len({labels[0], labels[1], labels[2]}) == 1
    assert len({labels[10], labels[11], labels[12]}) == 1
    assert labels[0] != labels[10]
