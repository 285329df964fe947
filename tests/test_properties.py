"""Property-based invariant tests (SURVEY.md §5) over random graphs.

Each property is an invariant every reference backend implicitly
guarantees: symmetry of the canonical edge relation, CC label = min
id of the component, the BFS edge triangle inequality
(``|d(u)-d(v)| ≤ 1`` across any edge), and PageRank mass
conservation on symmetric graphs.  Few examples, small graphs — each
example pays a full Spark job chain.
"""

from __future__ import annotations

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from graphdb_testing_spark.graph import symmetrize
from graphdb_testing_spark.operators.bfs import bfs
from graphdb_testing_spark.operators.components import connected_components
from graphdb_testing_spark.operators.pagerank import pagerank

pairs_strategy = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=30,
)

_settings = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _directed(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in pairs], "src long, dst long"
    )


def _components(pairs):
    """Ground-truth union-find on the undirected pair list."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in pairs:
        if u != v:
            parent[find(u)] = find(v)
    groups: dict[int, set[int]] = {}
    for u, v in pairs:
        if u == v:
            continue
        for x in (u, v):
            groups.setdefault(find(x), set()).add(x)
    return list(groups.values())


@given(pairs=pairs_strategy)
@_settings
def test_symmetrize_laws(spark, pairs):
    e = symmetrize(_directed(spark, pairs))
    rows = e.collect()
    seen = {(r.src, r.dst): r.wgt for r in rows}
    # no self-loops, unique pairs, symmetric with equal weight
    assert all(s != d for s, d in seen)
    assert len(seen) == len(rows)
    for (s, d), w in seen.items():
        assert seen.get((d, s)) == w
    # weight = multiplicity over both orientations of the input
    from collections import Counter

    multi = Counter()
    for u, v in pairs:
        if u != v:
            multi[(u, v)] += 1
            multi[(v, u)] += 1
    assert dict(multi) == seen


@given(pairs=pairs_strategy)
@_settings
def test_cc_label_is_component_min(spark, pairs):
    truth = _components(pairs)
    if not truth:
        return
    e = symmetrize(_directed(spark, pairs))
    labels = {r.id: r.label for r in connected_components(e).collect()}
    for comp in truth:
        want = min(comp)
        for v in comp:
            assert labels[v] == want


@given(pairs=pairs_strategy)
@_settings
def test_bfs_edge_triangle_inequality(spark, pairs):
    real = [(u, v) for u, v in pairs if u != v]
    if not real:
        return
    e = symmetrize(_directed(spark, pairs))
    source = min(min(u, v) for u, v in real)
    dist = {r.id: r.dist for r in bfs(e, source).collect()}
    assert dist[source] == 0
    for u, v in real:
        if u in dist and v in dist:
            assert abs(dist[u] - dist[v]) <= 1
        else:
            # an edge endpoint is reachable iff the other one is
            assert u not in dist and v not in dist


@given(pairs=pairs_strategy)
@_settings
def test_pagerank_mass_conservation(spark, pairs):
    if not any(u != v for u, v in pairs):
        return
    e = symmetrize(_directed(spark, pairs))
    total = pagerank(e, num_iter=10).agg(F.sum("pr").alias("s")).collect()[0]["s"]
    # symmetric graph, no dangling vertices: total rank mass stays 1
    assert abs(total - 1.0) < 1e-9


docs_strategy = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=40),
    min_size=1,
    max_size=12,
)


@given(texts=docs_strategy)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_chunking_reassembles_any_corpus(spark, texts):
    """Chunk texts (arbitrary spacing/empties) always reassemble to the
    original word sequence after overlap removal."""
    from graphdb_testing_spark.functions.curation import chunk_documents

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    chunks = chunk_documents(docs, chunk_tokens=5, overlap=2).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, text in enumerate(texts):
        got = sorted(by_doc[i], key=lambda r: r.chunk_id)
        rebuilt = got[0].chunk_text.split(" ")
        for c in got[1:]:
            rebuilt.extend(c.chunk_text.split(" ")[2:])
        assert rebuilt == text.split(" "), (i, text)


@given(
    rate_idx=st.integers(min_value=0, max_value=3),
    n=st.integers(min_value=1, max_value=40),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_sampling_nested_and_rate_monotone(spark, rate_idx, n):
    """Dyadic-rate samples are nested: sample(r/2) ⊆ sample(r)."""
    from graphdb_testing_spark.functions.curation import stratified_sample

    rates = [1.0, 0.5, 0.25, 0.125]
    docs = spark.createDataFrame(
        [(i, "x", "en") for i in range(n)], "doc_id long, text string, lang string"
    )
    hi = {r.doc_id for r in stratified_sample(
        docs, rates={}, default_rate=rates[rate_idx]).collect()}
    if rate_idx < 3:
        lo = {r.doc_id for r in stratified_sample(
            docs, rates={}, default_rate=rates[rate_idx + 1]).collect()}
        assert lo <= hi
    if rates[rate_idx] == 1.0:
        assert hi == set(range(n))


@given(
    texts=st.lists(st.text(alphabet="abc ", min_size=1, max_size=24),
                   min_size=2, max_size=8),
    t_idx=st.integers(min_value=0, max_value=2),
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_prefix_join_complete_on_random_corpora(spark, texts, t_idx):
    """Prefix filtering finds EVERY qualifying pair on arbitrary
    corpora (the completeness theorem, empirically)."""
    from itertools import combinations

    from graphdb_testing_spark.functions.dedup import jaccard_prefix_join

    threshold = [0.3, 0.5, 0.8][t_idx]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {(r.a_id, r.b_id) for r in
           jaccard_prefix_join(docs, threshold=threshold).collect()}
    sets = {i: {w for w in t.split(" ") if w} for i, t in enumerate(texts)}
    want = set()
    for a, b in combinations(sorted(sets), 2):
        if not sets[a] and not sets[b]:
            continue
        union = sets[a] | sets[b]
        if union and round(len(sets[a] & sets[b]) / len(union), 6) >= threshold:
            want.add((a, b))
    assert got == want


def test_hash_prefix_matches_duckdb_exactly(spark):
    """The ONE portable hash (hashutil) must agree with the DuckDB
    oracle idiom byte-for-byte on adversarial inputs: empty strings,
    unicode, pipes (the delimiter), long strings, digits."""
    import duckdb

    from graphdb_testing_spark.hashutil import hash_prefix

    samples = [
        "", "a", "|", "a|b", "||", "0", "-1", "9" * 100,
        "héllo wörld", "日本語テキスト", "emoji 🙂 test",
        "match|123|456", "dir|1|2", "hll|42",
        " leading", "trailing ", "tab\tsep", "new\nline",
    ] + [f"key-{i*7919}" for i in range(50)]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    for width in (8, 15):
        got = {
            r.s: r.h
            for r in df.select(
                "s", hash_prefix(F.col("s"), width).alias("h")
            ).collect()
        }
        con = duckdb.connect()
        for s in samples:
            want = con.execute(
                f"SELECT ('0x' || substr(md5(?), 1, {width}))::BIGINT", [s]
            ).fetchone()[0]
            assert got[s] == want, (s, width, got[s], want)


actions_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),  # src
        st.integers(min_value=0, max_value=12),  # dst
        st.booleans(),  # delete?
    ),
    min_size=1,
    max_size=30,
)


@given(acts=actions_strategy)
@example(acts=[(0, 1, True), (0, 1, False)])   # delete then re-insert
@example(acts=[(0, 1, False), (0, 1, True)])   # insert then delete
@example(acts=[(4, 5, True), (4, 5, False), (4, 5, True)])
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_apply_actions_matches_reference_model(spark, acts):
    """Random action sequences against a Python model of the
    reference merge semantics — SEQUENTIAL replay in seq order
    (``main.c:165-204`` applies incr/remove one action at a time, so
    an insert AFTER a delete of the same pair re-creates the edge;
    ``batch_delta`` reproduces that fixpoint).  Final tables agree
    exactly."""
    from graphdb_testing_spark.operators.updates import apply_actions

    base = spark.createDataFrame(
        [(0, 1, 2), (1, 0, 2), (2, 3, 1), (3, 2, 1)],
        "src long, dst long, wgt long",
    )
    rows = []
    for i, (u, v, is_del) in enumerate(acts):
        if u == v:
            continue
        if is_del:
            rows.append((i, -(u + 1), -(v + 1), 1))
        else:
            rows.append((i, u, v, 1))
    if not rows:
        return
    batch = spark.createDataFrame(
        rows, "seq long, src long, dst long, weight long"
    )
    got = {
        (r.src, r.dst): r.wgt
        for r in apply_actions(base, batch).collect()
    }

    # reference model: sequential replay per undirected pair — the
    # last delete resets the edge; inserts after it accumulate from
    # zero, inserts with no later delete accumulate onto the base
    model = {(0, 1): 2, (1, 0): 2, (2, 3): 1, (3, 2): 1}
    last_del: dict[tuple, int] = {}
    post_ins: dict[tuple, int] = {}
    for i, (u, v, is_del) in enumerate(acts):
        if u == v:
            continue
        key = (min(u, v), max(u, v))
        if is_del:
            last_del[key] = i
            post_ins.pop(key, None)
        else:
            post_ins[key] = post_ins.get(key, 0) + 1
    for (a, b), _ in last_del.items():
        model.pop((a, b), None)
        model.pop((b, a), None)
    for (a, b), w in post_ins.items():
        model[(a, b)] = model.get((a, b), 0) + w
        model[(b, a)] = model.get((b, a), 0) + w
    assert got == model


_graph_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=25,
)


@given(pairs=_graph_strategy)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_greedy_coloring_equals_sequential_on_random_graphs(spark, pairs):
    from graphdb_testing_spark.operators.coloring import greedy_coloring

    pairs = [(u, v) for u, v in pairs if u != v]
    if not pairs:
        return
    rows = [(u, v, 1) for u, v in pairs] + [(v, u, 1) for u, v in pairs]
    sym = spark.createDataFrame(rows, "src long, dst long, wgt long").distinct()
    out = {r["id"]: r["color"] for r in greedy_coloring(sym, rounds=12).collect()}

    adj: dict[int, set[int]] = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    seq: dict[int, int] = {}
    for v in sorted(adj):
        used = {seq[n] for n in adj[v] if n in seq}
        c = 0
        while c in used:
            c += 1
        seq[v] = c
    assert out == seq


# retention manifest invariants: random corpora of words drawn from a
# tiny vocabulary (forcing both exact and near duplication), brute-
# force shingle Jaccard as ground truth for the verified-pair graph
corpus_strategy = st.lists(
    st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta"]),
             min_size=3, max_size=12),
    min_size=2,
    max_size=10,
)


@given(word_lists=corpus_strategy)
@_settings
def test_retention_manifest_invariants(spark, word_lists):
    """For ANY corpus: one manifest row per doc; cluster_id = min
    member id; exactly one keep per cluster; cluster_size counts the
    members; exact duplicates always share a cluster; and every
    same-cluster pair is connected in the brute-force Jaccard≥0.8
    graph (no over-merging — LSH can only lose pairs, CC cannot
    invent them)."""
    from graphdb_testing_spark.functions.dedup import dedup_retention

    docs = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = dedup_retention(df, 0.8).collect()
    assert sorted(r.doc_id for r in rows) == list(range(len(docs)))

    clusters: dict[int, list] = {}
    for r in rows:
        clusters.setdefault(r.cluster_id, []).append(r)
    for cid, members in clusters.items():
        ids = sorted(m.doc_id for m in members)
        assert cid == ids[0]
        assert all(m.cluster_size == len(ids) for m in members)
        assert sum(m.keep for m in members) == 1

    # exact duplicates must co-cluster
    by_text: dict[str, list[int]] = {}
    for i, txt in docs:
        by_text.setdefault(txt, []).append(i)
    label = {r.doc_id: r.cluster_id for r in rows}
    for ids in by_text.values():
        if len(ids) > 1:
            assert len({label[i] for i in ids}) == 1

    # no over-merge: same-cluster pairs are connected in the exact
    # Jaccard>=0.8 graph (union-find over brute-force pairs)
    def shingles(t):
        return {t[i : i + 8] for i in range(len(t) - 7)} if len(t) >= 8 else set()

    sh = {i: shingles(t) for i, t in docs}
    edges = []
    for i, _ in docs:
        for j, _ in docs:
            if i < j and sh[i] and sh[j]:
                inter = len(sh[i] & sh[j])
                jac = round(inter / (len(sh[i]) + len(sh[j]) - inter), 6)
                if jac >= 0.8:
                    edges.append((i, j))
    truth = _components(edges)
    # truth maps only matched docs; singleton docs have no constraint
    tl = {}
    for members in truth:
        for m in members:
            tl[m] = min(members)
    for cid, members in clusters.items():
        ids = [m.doc_id for m in members]
        if len(ids) > 1:
            assert all(i in tl for i in ids), (ids, edges)
            assert len({tl[i] for i in ids}) == 1, (ids, edges)
