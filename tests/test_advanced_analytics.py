"""Betweenness centrality and community agglomeration (A5, A6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_testing_spark.operators.betweenness import betweenness, sample_roots
from graphdb_testing_spark.operators.community import (
    community_agglomeration,
    community_sizes,
)


def test_betweenness_path_graph_exact(spark, path_graph):
    # P5 (0-1-2-3-4) + disjoint edge: exact BC with all P5 roots.
    # Closed form (directed-both-ways convention, per-root deltas):
    # vertex 2 lies on 0-4,0-3,1-4,1-3 paths both directions -> bc=8? no:
    # Brandes delta sums: bc(1)=bc(3)=6, bc(2)=8 for P5 with all 5 roots.
    bc = {
        r.id: r.bc
        for r in betweenness(path_graph, roots=[0, 1, 2, 3, 4]).collect()
    }
    assert bc[2] == pytest.approx(8.0)
    assert bc[1] == pytest.approx(6.0) and bc[3] == pytest.approx(6.0)
    assert bc.get(0, 0.0) == pytest.approx(0.0) and bc.get(4, 0.0) == pytest.approx(0.0)


def test_betweenness_star_center(spark, star_graph):
    bc = {r.id: r.bc for r in betweenness(star_graph, roots=list(range(0, 7))).collect()}
    # center lies on every leaf-leaf path: 6 roots x 5 targets = 30
    assert bc[0] == pytest.approx(30.0)
    for leaf in range(1, 7):
        assert bc.get(leaf, 0.0) == pytest.approx(0.0)


def test_betweenness_bridge(spark, bridged_cliques):
    roots = list(range(8))
    bc = {r.id: r.bc for r in betweenness(bridged_cliques, roots=roots).collect()}
    # bridge endpoints dominate
    assert bc[3] > bc[0] and bc[4] > bc[7]


def test_sample_roots_deterministic(spark, bridged_cliques):
    a = sample_roots(bridged_cliques, 3)
    b = sample_roots(bridged_cliques, 3)
    assert a == b and len(a) == 3


def test_community_bridged_cliques(spark, bridged_cliques):
    mapping = community_agglomeration(bridged_cliques, max_levels=5)
    got = {r.id: r.community for r in mapping.collect()}
    assert len(got) == 8
    # the two cliques must not fully merge into one community
    n_comms = len(set(got.values()))
    assert 1 < n_comms < 8
    sizes = {r.community: r.size for r in community_sizes(mapping).collect()}
    assert sum(sizes.values()) == 8


def test_community_weights_pull_pairs_together(spark):
    # two heavy pairs + light cross edges: pairs contract first
    rows = []
    for u, v, w in [(1, 2, 100), (3, 4, 100), (2, 3, 1)]:
        rows += [(u, v, w), (v, u, w)]
    e = spark.createDataFrame(rows, "src long, dst long, wgt long")
    got = {r.id: r.community for r in community_agglomeration(e, max_levels=3).collect()}
    assert got[1] == got[2]
    assert got[3] == got[4]
    assert got[1] != got[3]


def test_core_numbers_match_peeling(spark, bridged_cliques):
    """Cross-implementation agreement: the h-index-fixpoint core
    numbers must equal the peeling definition for every k."""
    from pyspark.sql import functions as F

    from graphdb_testing_spark.operators.kcore import core_numbers, kcore_vertices

    cores = {r.id: r.core for r in core_numbers(bridged_cliques).collect()}
    assert cores, "non-empty graph must yield core numbers"
    max_core = max(cores.values())
    for k in range(1, max_core + 2):
        peeled = {r.id for r in kcore_vertices(bridged_cliques, k).collect()}
        via_core = {v for v, c in cores.items() if c >= k}
        assert peeled == via_core, f"k={k}: peel={peeled} core={via_core}"


def test_ktruss_peels_to_clique_core(spark, bridged_cliques):
    from graphdb_testing_spark.operators.ktruss import ktruss

    # two K4s {0..3},{4..7} joined by bridge 3-4: every clique edge
    # closes 2 triangles (4-truss); the bridge closes none -> peeled
    out = {(r.src, r.dst) for r in ktruss(bridged_cliques, k=4).collect()}
    cliques = {(a, b) for grp in ([0, 1, 2, 3], [4, 5, 6, 7])
               for a in grp for b in grp if a < b}
    assert out == cliques

    # k=5 needs every edge in >=3 triangles; a 4-clique can't provide
    assert ktruss(bridged_cliques, k=5).count() == 0


def test_densest_peeling_finds_planted_clique(spark):
    from graphdb_testing_spark.operators.densest import densest_subgraph_peeling
    from tests.conftest import edges_df

    # K6 (density 2.5) plus a long path of pendants (density ~1):
    # peeling must strip the path and keep the clique round densest
    k6 = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    path = [(100 + i, 101 + i) for i in range(10)] + [(5, 100)]
    trace = densest_subgraph_peeling(edges_df(spark, k6 + path), rounds=5).collect()
    best = max(trace, key=lambda r: r.density)
    assert best.density == 2.5 and best.nv == 6 and best.ne == 15
    assert trace[0].density < 2.5  # the full graph is less dense


def test_scc_matches_networkx(spark):
    """SCC on a deterministic pseudo-random orientation agrees with
    networkx.strongly_connected_components (partition equality)."""
    nx = pytest.importorskip("networkx")
    from graphdb_testing_spark.operators.scc import strongly_connected_components

    # deterministic digraph: cycles + DAG tails + isolated-ish fringe
    n = 60
    pairs = set()
    for v in range(n):
        pairs.add((v, (v * 7 + 3) % n))
        if v % 3 == 0:
            pairs.add((v, (v * 5 + 11) % n))
    pairs = {(u, v) for (u, v) in pairs if u != v}
    df = spark.createDataFrame(sorted(pairs), "src long, dst long")
    got = {
        (r.id, r.scc_id)
        for r in strongly_connected_components(df, max_outer=60).collect()
    }
    g = nx.DiGraph(sorted(pairs))
    want = {
        (v, min(comp))
        for comp in nx.strongly_connected_components(g)
        for v in comp
    }
    assert got == want


def test_scc_two_cycles_and_bridge(spark):
    """Two 3-cycles joined by a one-way bridge stay separate SCCs."""
    from graphdb_testing_spark.operators.scc import strongly_connected_components

    pairs = [(0, 1), (1, 2), (2, 0), (2, 10), (10, 11), (11, 12), (12, 10)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        (r.id, r.scc_id) for r in strongly_connected_components(df).collect()
    }
    assert got == {(0, 0), (1, 0), (2, 0), (10, 10), (11, 10), (12, 10)}


def test_parity_check_even_and_odd_cycle(spark):
    from graphdb_testing_spark.queries_analytics import _parity_check
    from tests.conftest import edges_df

    even = edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    r = _parity_check(even).collect()[0]
    assert (r.n_reached, r.n_odd_edges, r.is_bipartite) == (4, 0, 1)
    odd = edges_df(spark, [(0, 1), (1, 2), (2, 0)])
    r = _parity_check(odd).collect()[0]
    assert (r.n_odd_edges, r.is_bipartite) == (1, 0)


def test_greedy_mis_independent_and_maximal(spark):
    from graphdb_testing_spark.operators.mis import greedy_mis
    from tests.conftest import edges_df

    # deterministic quasi-random graph
    pairs = sorted({(min(u, (u * 13 + 5) % 40), max(u, (u * 13 + 5) % 40))
                    for u in range(40)
                    if u != (u * 13 + 5) % 40})
    e = edges_df(spark, pairs)
    res = {r.id: r.status for r in greedy_mis(e, rounds=12).collect()}
    assert -1 not in res.values()  # converged
    mis = {v for v, s in res.items() if s == 1}
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    # independence
    assert all(not (adj.get(u, set()) & mis) for u in mis)
    # maximality: every non-MIS vertex has an MIS neighbor
    assert all(adj.get(v, set()) & mis for v in res if v not in mis)
    # equals the sequential greedy-by-id MIS
    seq = set()
    for v in sorted(adj):
        if not (adj[v] & seq):
            seq.add(v)
    assert mis == seq


def test_greedy_matching_is_maximal_matching(spark):
    from graphdb_testing_spark.operators.mis import greedy_matching
    from tests.conftest import edges_df

    pairs = sorted({(min(u, (u * 11 + 7) % 30), max(u, (u * 11 + 7) % 30))
                    for u in range(30)
                    if u != (u * 11 + 7) % 30})
    e = edges_df(spark, pairs)
    m = [(r.u, r.v) for r in greedy_matching(e, rounds=12).collect()]
    used = [x for uv in m for x in uv]
    assert len(used) == len(set(used))  # a matching: no vertex twice
    # maximality: every unmatched edge touches a matched vertex
    us = set(used)
    assert all(u in us or v in us for u, v in pairs)


def test_scc_chain_of_cycles_with_tails(spark):
    """Condensation chain: C1 -> C2 -> C3 (3 cycles bridged one-way)
    plus DAG tails — exercises trim AND multi-round peeling."""
    from graphdb_testing_spark.operators.scc import strongly_connected_components

    pairs = [
        (0, 1), (1, 2), (2, 0),          # C1
        (2, 10),                          # bridge
        (10, 11), (11, 12), (12, 10),     # C2
        (12, 20),                         # bridge
        (20, 21), (21, 20),               # C3
        (21, 30), (30, 31),               # tail
        (40, 0),                          # source tail into C1
    ]
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {}
    for r in strongly_connected_components(df).collect():
        got.setdefault(r.scc_id, set()).add(r.id)
    comps = sorted(map(frozenset, got.values()), key=min)
    assert comps == sorted(
        [frozenset({0, 1, 2}), frozenset({10, 11, 12}), frozenset({20, 21}),
         frozenset({30}), frozenset({31}), frozenset({40})],
        key=min,
    )


def test_two_shortest_walk_values_on_path(spark):
    """P3 path with unit weights: second-distinct walk length to the
    far end is dist+2 (one back-and-forth detour)."""
    from graphdb_testing_spark.operators.bfs import two_shortest
    from tests.conftest import edges_df

    e = edges_df(spark, [(0, 1), (1, 2)])
    got = {r.id: (r.d1, r.d2) for r in two_shortest(e, 0, rounds=8).collect()}
    assert got[0][0] == 0 and got[0][1] == 2  # 0 -> 1 -> 0
    assert got[1] == (1, 3)
    assert got[2] == (2, 4)


def test_boruvka_msf_matches_networkx(spark):
    """Forest totals: same total weight and edge count as Kruskal on a
    random weighted connected graph, plus per-component spanning
    (forest edge count = nv - n_components)."""
    nx = pytest.importorskip("networkx")
    import random

    from graphdb_testing_spark.operators.components import (
        component_count,
        connected_components,
    )
    from graphdb_testing_spark.operators.mst import boruvka_msf

    from tests.conftest import edges_df

    rng = random.Random(7)
    n = 40
    pairs = set()
    for i in range(1, n):
        pairs.add((rng.randrange(i), i))  # random spanning tree
    while len(pairs) < 90:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            pairs.add((min(u, v), max(u, v)))
    weights = [rng.randrange(1, 50) for _ in pairs]
    e = edges_df(spark, sorted(pairs), weights)
    got = boruvka_msf(e, rounds=8).collect()
    g = nx.Graph()
    for (u, v), w in zip(sorted(pairs), weights):
        g.add_edge(u, v, weight=w)
    want = nx.minimum_spanning_tree(g, algorithm="kruskal")
    assert len(got) == n - 1
    assert sum(r["w"] for r in got) == sum(
        d["weight"] for _, _, d in want.edges(data=True)
    )
    # chosen edges form a spanning forest: acyclic + connects everything
    msf_edges = spark.createDataFrame(
        [(r["u"], r["v"], 1) for r in got], "src long, dst long, wgt long"
    )
    sym = msf_edges.unionAll(
        msf_edges.selectExpr("dst as src", "src as dst", "wgt")
    )
    assert component_count(connected_components(sym)) == 1


def test_boruvka_msf_disjoint_forest(spark, path_graph):
    """Two components -> forest with nv - 2 edges, unit weights."""
    from graphdb_testing_spark.operators.mst import boruvka_msf

    got = boruvka_msf(path_graph, rounds=6).collect()
    assert len(got) == 7 - 2  # 7 vertices, 2 components
    assert all(r["w"] == 1 for r in got)


def test_edge_betweenness_path_graph_exact(spark, path_graph):
    """P5: edge (i,i+1) carries 2·(i+1)·(4−i) ordered pairs (both
    directions, all 5 path roots); the disjoint edge gets none of
    these roots' paths and is absent."""
    from graphdb_testing_spark.operators.betweenness import edge_betweenness

    got = {
        (r.u, r.v): r.bc
        for r in edge_betweenness(path_graph, roots=[0, 1, 2, 3, 4]).collect()
    }
    assert got == {
        (0, 1): pytest.approx(8.0),
        (1, 2): pytest.approx(12.0),
        (2, 3): pytest.approx(12.0),
        (3, 4): pytest.approx(8.0),
    }


def test_greedy_coloring_proper_and_matches_sequential(spark, bridged_cliques):
    from graphdb_testing_spark.operators.coloring import greedy_coloring

    edges = bridged_cliques
    sym = edges.selectExpr("dst as src", "src as dst", "wgt").unionAll(edges)
    out = {r["id"]: r["color"] for r in greedy_coloring(sym, rounds=8).collect()}

    adj: dict[int, set[int]] = {}
    for r in sym.select("src", "dst").distinct().collect():
        adj.setdefault(r["src"], set()).add(r["dst"])
    # converged, proper, and equal to sequential greedy in id order
    assert all(c >= 0 for c in out.values())
    for u, nbrs in adj.items():
        for v in nbrs:
            assert out[u] != out[v]
    seq: dict[int, int] = {}
    for v in sorted(adj):
        used = {seq[n] for n in adj[v] if n in seq}
        c = 0
        while c in used:
            c += 1
        seq[v] = c
    assert out == seq


def test_spectral_bisection_separates_bridged_cliques(spark, bridged_cliques):
    from graphdb_testing_spark.operators.spectral import spectral_bisection

    edges = bridged_cliques
    sym = edges.selectExpr("dst as src", "src as dst", "wgt").unionAll(edges)
    out = spectral_bisection(sym, rounds=10).collect()
    sides = {r["id"]: r["side"] for r in out}
    vs = {r["id"]: r["v"] for r in out}
    # the two K4s ({0..3} and {4..7} in the fixture) land on opposite
    # sides, uniformly within each clique
    left = {sides[i] for i in range(4)}
    right = {sides[i] for i in range(4, 8)}
    assert len(left) == 1 and len(right) == 1 and left != right, (sides, vs)


def test_deferred_prefs_threshold_path_exact(spark):
    """With many acceptors the preference build takes the threshold
    pre-filter + exact-fallback path (round-3 verdict item 4); its
    top-k must be bit-identical to brute force, and the plan must
    not shuffle the full cross product (the only join of the big
    sides is a broadcast nested loop with the filter inside)."""
    import hashlib

    from graphdb_testing_spark.operators import deferred

    ncust, nsup, k = 25, 300, 2  # 300 > 4·OVERSAMPLE·k = 64 ⇒ threshold path
    cust = spark.createDataFrame([(i,) for i in range(ncust)], "c long")
    sup = spark.createDataFrame([(j,) for j in range(nsup)], "s long")
    got = sorted(
        (r.c, r.rank, r.s, r.score)
        for r in deferred._prefs(cust, sup, k).collect()
    )

    def score(c, s):
        return int(hashlib.md5(f"gs|{c}|{s}".encode()).hexdigest()[:8], 16)

    want = []
    for c in range(ncust):
        ranked = sorted(range(nsup), key=lambda s: (score(c, s), s))[:k]
        want += [(c, r + 1, s, score(c, s)) for r, s in enumerate(ranked)]
    assert got == sorted(want)


def test_deferred_prefs_guard_refuses_unbroadcastable(spark, monkeypatch):
    import pytest

    from graphdb_testing_spark.operators import deferred

    monkeypatch.setattr(deferred, "MAX_ACCEPTORS", 5)
    cust = spark.createDataFrame([(i,) for i in range(3)], "c long")
    sup = spark.createDataFrame([(j,) for j in range(9)], "s long")
    with pytest.raises(ValueError, match="broadcast"):
        deferred._prefs(cust, sup, 2)


def test_deferred_acceptance_stability_and_model(spark):
    """The distributed rounds must equal the sequential McVitie-Wilson
    model on the same hash preferences, and the result must contain
    no blocking pair among tried choices."""
    import hashlib

    from graphdb_testing_spark.operators.deferred import deferred_acceptance

    ncust, nsup, k = 12, 4, 4
    cust = spark.createDataFrame([(i,) for i in range(ncust)], "c long")
    sup = spark.createDataFrame([(j,) for j in range(nsup)], "s long")
    out = {
        r["c"]: (r["matched_s"], r["n_proposals"])
        for r in deferred_acceptance(cust, sup, rounds=12, k=k).collect()
    }

    def score(c, s):
        return int(hashlib.md5(f"gs|{c}|{s}".encode()).hexdigest()[:8], 16)

    prefs = {
        c: sorted(range(nsup), key=lambda s: (score(c, s), s))[:k]
        for c in range(ncust)
    }
    # sequential deferred acceptance
    ptr = {c: 0 for c in range(ncust)}
    held: dict[int, int] = {}
    free = list(range(ncust))
    while free:
        c = free.pop(0)
        if ptr[c] >= k:
            continue
        s = prefs[c][ptr[c]]
        ptr[c] += 1
        cur = held.get(s)
        if cur is None or (score(c, s), c) < (score(cur, s), cur):
            if cur is not None:
                free.append(cur)
            held[s] = c
        else:
            free.append(c)
    want = {
        c: next((s for s, cc in held.items() if cc == c), -1) for c in range(ncust)
    }
    assert {c: m for c, (m, _) in out.items()} == want
    # no blocking pair among tried prefixes
    for c in range(ncust):
        m, n_used = out[c]
        tried = prefs[c][:n_used]
        for s in tried:
            if s == m:
                continue
            holder = held.get(s)
            assert holder is not None and (score(holder, s), holder) < (
                score(c, s),
                c,
            )
