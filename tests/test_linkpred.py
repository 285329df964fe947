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


def test_random_walks_follow_edges(spark, bridged_cliques):
    from graphdb_testing_spark.operators.sampling import random_walks

    walks = random_walks(bridged_cliques, walk_length=4, start_every=1).collect()
    edge_set = {(r.src, r.dst) for r in bridged_cliques.select("src", "dst").collect()}
    by_walk: dict[int, dict[int, int]] = {}
    for r in walks:
        by_walk.setdefault(r.walk_id, {})[r.step] = r.vertex
    assert len(by_walk) == bridged_cliques.select("src").distinct().count()
    for wid, steps in by_walk.items():
        assert sorted(steps) == [0, 1, 2, 3, 4]
        assert steps[0] == wid
        for s in range(1, 5):
            assert (steps[s - 1], steps[s]) in edge_set
    # deterministic: identical on re-run
    again = {(r.walk_id, r.step, r.vertex) for r in random_walks(
        bridged_cliques, walk_length=4, start_every=1).collect()}
    assert again == {(r.walk_id, r.step, r.vertex) for r in walks}


def test_negative_samples_are_nonedges(spark, bridged_cliques):
    from graphdb_testing_spark.operators.sampling import negative_samples

    edge_set = {(r.src, r.dst) for r in bridged_cliques.select("src", "dst").collect()}
    verts = {r.src for r in bridged_cliques.select("src").distinct().collect()}
    out = negative_samples(bridged_cliques, k=4).collect()
    assert len(out) > 0
    for r in out:
        assert (r.src, r.candidate) not in edge_set
        assert r.candidate in verts and r.src != r.candidate
        assert 0 <= r.sample_no < 4


def test_weighted_walks_follow_edges_and_bias(spark):
    from graphdb_testing_spark.operators.sampling import weighted_random_walks

    # star with one overwhelming edge 0-1 (weight 1000) vs 0-2 (w 1):
    # nearly every draw from 0 must choose 1
    g = edges_df(spark, [(0, 1), (0, 2)], weights=[1000, 1])
    walks = weighted_random_walks(g, walk_length=6, start_every=1).collect()
    edge_set = {(r.src, r.dst) for r in g.select("src", "dst").collect()}
    by_walk: dict[int, dict[int, int]] = {}
    for r in walks:
        by_walk.setdefault(r.walk_id, {})[r.step] = r.vertex
    for wid, steps in by_walk.items():
        assert sorted(steps) == list(range(7))
        for s in range(1, 7):
            assert (steps[s - 1], steps[s]) in edge_set
    # bias: across all draws leaving vertex 0, the heavy edge dominates
    from_zero = [
        steps[s]
        for steps in by_walk.values()
        for s in range(1, 7)
        if steps[s - 1] == 0
    ]
    assert from_zero and from_zero.count(1) / len(from_zero) > 0.8


def test_node2vec_walks_follow_edges_and_low_p_biases_back(spark):
    from graphdb_testing_spark.operators.sampling import node2vec_walks

    # path graph: from the middle of a path, a huge return multiplier
    # must pull the walker back where it came from
    g = edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    edge_set = {(r.src, r.dst) for r in g.select("src", "dst").collect()}
    walks = node2vec_walks(
        g, walk_length=4, start_every=1,
        return_mult=1000, in_out_mult=1, base_mult=1,
    ).collect()
    by_walk: dict[int, dict[int, int]] = {}
    for r in walks:
        by_walk.setdefault(r.walk_id, {})[r.step] = r.vertex
    backtracks = total = 0
    for steps in by_walk.values():
        assert sorted(steps) == list(range(5))
        for s in range(1, 5):
            assert (steps[s - 1], steps[s]) in edge_set
        for s in range(2, 5):
            total += 1
            if steps[s] == steps[s - 2]:
                backtracks += 1
    # with return weight 1000:1 nearly every 2nd-order step backtracks
    assert backtracks / total > 0.8
