"""Corpus-curation operators: decontamination, deterministic
stratified sampling, chunking, repetition scoring."""

from __future__ import annotations

import pytest

from graphdb_testing_spark.functions import curation


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # benchmark doc (the "eval set")
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "bench"),
        # training doc embedding the benchmark 8-gram verbatim -> contaminated
        (2, "intro words alpha beta gamma delta epsilon zeta eta theta outro", "en", "train"),
        # training doc with no 8-gram overlap
        (3, "one two three four five six seven eight nine ten eleven twelve", "en", "train"),
        # short training doc (< 8 words) -> zero grams, never contaminated
        (4, "tiny doc here", "zh", "train"),
        # repetitive doc: every trigram is 'spam spam spam'
        (5, "spam spam spam spam spam spam spam spam", "de", "train"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_decontaminate_flags_overlap(spark, corpus):
    train = corpus.filter(corpus.source == "train")
    bench = corpus.filter(corpus.source == "bench")
    out = {r.doc_id: r for r in curation.decontaminate(train, bench, n=8).collect()}
    assert set(out) == {2, 3, 4, 5}
    assert out[2].contaminated and out[2].n_shared_grams == 1  # the verbatim 8-gram
    assert not out[3].contaminated and out[3].n_shared_grams == 0
    assert not out[4].contaminated  # too short to produce a gram
    assert not out[5].contaminated


def test_stratified_sample_deterministic_and_nested(spark, corpus):
    half = curation.stratified_sample(corpus, rates={}, default_rate=0.5)
    quarter = curation.stratified_sample(corpus, rates={}, default_rate=0.25)
    half_ids = {r.doc_id for r in half.collect()}
    quarter_ids = {r.doc_id for r in quarter.collect()}
    # nested: lower rate is an exact subset of the higher rate
    assert quarter_ids <= half_ids
    # deterministic: a re-run picks identical rows
    assert {r.doc_id for r in curation.stratified_sample(
        corpus, rates={}, default_rate=0.5).collect()} == half_ids
    # per-stratum rate=1.0 keeps every row of that stratum
    all_en = curation.stratified_sample(corpus, rates={"en": 1.0}, default_rate=0.0)
    assert {r.doc_id for r in all_en.collect()} == {1, 2, 3}


def test_chunk_documents_reassembles(spark, corpus):
    chunks = curation.chunk_documents(corpus, chunk_tokens=4, overlap=1).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc in corpus.collect():
        words = doc.text.split(" ")
        got = sorted(by_doc[doc.doc_id], key=lambda r: r.chunk_id)
        # stride = 3: chunk i starts at word 3*i; overlap word repeats
        rebuilt = got[0].chunk_text.split(" ")
        for c in got[1:]:
            rebuilt.extend(c.chunk_text.split(" ")[1:])  # drop 1-word overlap
        assert rebuilt == words, doc.doc_id
        assert all(r.n_tokens == len(r.chunk_text.split(" ")) for r in got)


def test_repetition_scores(spark, corpus):
    out = {r.doc_id: r for r in curation.repetition_scores(corpus, n=3).collect()}
    assert out[5].distinct_ngrams == 1 and out[5].total_ngrams == 6
    assert out[5].dup_ngram_ratio == pytest.approx(1 - 1 / 6, abs=1e-6)
    assert out[1].dup_ngram_ratio == 0.0  # all-distinct words
    assert out[4].total_ngrams == 1 and out[4].dup_ngram_ratio == 0.0


def test_curation_decision_flags(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # dup of 1
        (3, "spam spam spam spam spam spam spam spam"),  # repetitive + low diversity
        (4, "ok"),  # short
        (5, "one two three four five six seven eight nine ten"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in curation.curation_decision(
        docs, min_chars=10, min_distinct_ratio=0.4, max_dup_ngram_ratio=0.3
    ).collect()}
    assert out[1].keep and out[1].drop_reasons == ""
    assert not out[2].keep and out[2].drop_reasons == "dup"
    assert not out[3].keep and out[3].drop_reasons == "low_diversity,repetitive"
    assert not out[4].keep and out[4].drop_reasons == "short"
    assert out[5].keep


def test_pack_sequences_greedy_invariants(spark):
    rows = [(i, " ".join(["w"] * n)) for i, n in
            [(1, 10), (2, 20), (3, 40), (4, 5), (5, 70), (6, 8)]]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation.pack_sequences(docs, capacity=32, num_buckets=1).collect()
    assert {r.doc_id for r in out} == {1, 2, 3, 4, 5, 6}
    by_bin: dict[int, list] = {}
    for r in sorted(out, key=lambda r: r.doc_id):
        by_bin.setdefault(r.bin_no, []).append(r)
    # greedy in doc_id order at capacity 32:
    # [10+20] [40] [5] then 70 overflows alone, [8]
    fills = {b: sum(r.n_tokens for r in rs) for b, rs in by_bin.items()}
    assert fills == {0: 30, 1: 40, 2: 5, 3: 70, 4: 8}
    # bins are contiguous in doc order
    assert [r.bin_no for r in sorted(out, key=lambda r: r.doc_id)] == [
        0, 0, 1, 2, 3, 4]


def test_scrub_pii_redacts_and_counts(spark):
    rows = [
        (1, "contact me at jane.doe+x@example.com or 555-123-4567 ok"),
        (2, "server at 192.168.1.1 and 10.0.0.255 responded"),
        (3, "no sensitive content here at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in curation.scrub_pii(docs).collect()}
    assert (out[1].n_email, out[1].n_phone, out[1].n_ipv4) == (1, 1, 0)
    assert (out[2].n_email, out[2].n_phone, out[2].n_ipv4) == (0, 0, 2)
    assert (out[3].n_email, out[3].n_phone, out[3].n_ipv4) == (0, 0, 0)
    import hashlib
    assert out[1].clean_fingerprint == hashlib.md5(
        b"contact me at [EMAIL] or [PHONE] ok").hexdigest()
    assert out[2].clean_fingerprint == hashlib.md5(
        b"server at [IPV4] and [IPV4] responded").hexdigest()
    assert out[3].clean_fingerprint == hashlib.md5(
        b"no sensitive content here at all").hexdigest()


def test_boilerplate_stats_flags_repeated_spans(spark):
    from graphdb_testing_spark.functions.curation import boilerplate_stats

    rows = [(i, "common span here unique%d tail" % i) for i in range(10)]
    rows.append((99, "totally different words entirely"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.total_grams, r.boiler_grams, r.boiler_ratio_milli)
        for r in boilerplate_stats(docs, n=2, min_df=10).collect()
    }
    # "common span" and "span here" appear in 10 docs -> boilerplate;
    # "here uniqueN" / "uniqueN tail" are per-doc singletons
    assert out[0] == (4, 2, 500)
    assert out[99] == (3, 0, 0)


def test_dsir_logratios_matches_bruteforce(spark, corpus):
    """dsir_micro must equal an independent pure-Python reference."""
    import hashlib
    import math

    rows = {r.doc_id: (r.text, r.lang) for r in corpus.collect()}
    B = 64  # small bucket count to force collisions on purpose

    def feats(text):
        w = text.split(" ")
        grams = list(w) + [f"{a} {b}" for a, b in zip(w, w[1:])]
        return [
            int(hashlib.md5(f"dsir|{g}".encode()).hexdigest()[:8], 16) % B
            for g in grams
        ]

    raw_stream = {d: feats(t) for d, (t, _) in rows.items()}
    tgt_stream = {d: f for d, f in raw_stream.items() if rows[d][1] == "en"}
    n_raw = sum(len(f) for f in raw_stream.values())
    n_tgt = sum(len(f) for f in tgt_stream.values())
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    for f in raw_stream.values():
        for b in f:
            cr[b] = cr.get(b, 0) + 1
    for f in tgt_stream.values():
        for b in f:
            ct[b] = ct.get(b, 0) + 1
    # op-for-op twin of the overflow-safe form: two lns of exact
    # ratios, never an integer product
    lp = {
        b: round(
            1e6
            * (
                math.log((ct.get(b, 0) + 1) / (cr[b] + 1))
                + math.log((n_raw + B) / (n_tgt + B))
            )
        )
        for b in cr
    }
    want = {
        d: (len(f), sum(lp[b] for b in f)) for d, f in raw_stream.items()
    }

    target = corpus.filter(corpus.lang == "en")
    got = {
        r.doc_id: (r.n_feats, r.dsir_micro)
        for r in curation.dsir_logratios(corpus, target, n_buckets=B).collect()
    }
    assert got == want
    # directional sanity: an English doc scores itself above the
    # non-English docs on average (the target IS the en subset)
    en = [got[d][1] / got[d][0] for d, (_, l) in rows.items() if l == "en"]
    other = [got[d][1] / got[d][0] for d, (_, l) in rows.items() if l != "en"]
    assert min(en) > max(other)


def test_unimax_budgets_waterfill(spark):
    """Hand-checked waterfill: caps ascending [12, 40, 400], several
    budget regimes, exact integer remainder distribution."""
    rows = [
        (1, "a b c", "zh", "s"),          # 3 tokens -> cap 12
        (2, "a b c d e f g h i j", "de", "s"),  # 10 tokens -> cap 40
        (3, " ".join(["w"] * 100), "en", "s"),   # 100 tokens -> cap 400
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )

    def alloc(total):
        return {
            r.lang: (r.n_tokens, r.cap, r.budget_tokens, r.epochs_milli)
            for r in curation.unimax_budgets(docs, total, max_epochs=4).collect()
        }

    # regime 1: budget 100 — zh caps (12*3=36<=100), de caps
    # (40*2=80 <= 88), en takes the rest (48)
    a = alloc(100)
    assert a["zh"] == (3, 12, 12, 4000)
    assert a["de"] == (10, 40, 40, 4000)
    assert a["en"] == (100, 400, 48, 480)
    assert sum(v[2] for v in a.values()) == 100
    # regime 2: budget 31 — nobody caps (12*3=36>31); 31 = 3*10+1,
    # remainder goes to the first language in (cap, lang) order
    a = alloc(31)
    assert [a["zh"][2], a["de"][2], a["en"][2]] == [11, 10, 10]
    # regime 3: budget beyond all caps — every language fully epoched
    a = alloc(10_000)
    assert [a[k][2] for k in ("zh", "de", "en")] == [12, 40, 400]
    assert all(v[3] == 4000 for v in a.values())


def test_shard_plan_balanced_properties(spark):
    """Balance bound, coverage, and within-shard shuffle determinism."""
    rows = [
        (i, " ".join(["w"] * n), "en", "s")
        for i, n in enumerate([100, 90, 80, 70, 33, 21, 13, 8, 5, 3, 2, 1])
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    plan = curation.shard_plan_balanced(docs, n_shards=4).collect()
    assert len(plan) == len(rows)  # every doc placed exactly once
    by_shard: dict[int, list] = {}
    for r in plan:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    # snake deal: rank 0..3 -> shards 0,1,2,3; rank 4..7 -> 3,2,1,0
    totals = {s: sum(r.n_tokens for r in rs) for s, rs in by_shard.items()}
    assert totals == {0: 100 + 8 + 5, 1: 90 + 13 + 3, 2: 80 + 21 + 2, 3: 70 + 33 + 1}
    # balance: max-min gap bounded by the largest document
    assert max(totals.values()) - min(totals.values()) <= 100
    # pos is a permutation 1..k within each shard
    for rs in by_shard.values():
        assert sorted(r.pos for r in rs) == list(range(1, len(rs) + 1))
    # deterministic across re-runs
    again = curation.shard_plan_balanced(docs, n_shards=4).collect()
    assert sorted(map(tuple, plan)) == sorted(map(tuple, again))


# ---------------------------------------------------------------------------
# round-6: Gumbel top-k weighted sampling (the resampling half of DSIR)
# ---------------------------------------------------------------------------


def _gumbel_bruteforce(weights, k, tau, salt="gumbel-v1"):
    """Reference implementation: same portable hash noise, python math."""
    import hashlib
    import math

    keyed = []
    for doc_id, w in weights.items():
        h = int(hashlib.md5(f"{salt}|{doc_id}".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        keyed.append((w / tau - math.log(-math.log(u)), doc_id))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    return keyed[:k]


def test_gumbel_topk_matches_bruteforce(spark):
    rows = [(i, float((i * 37) % 11) - 5.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = curation.gumbel_topk_sample(df, k=25, tau=2.0).collect()
    want = _gumbel_bruteforce(dict(rows), 25, 2.0)
    assert [r.doc_id for r in got] != []
    assert {r.doc_id for r in got} == {d for _, d in want}
    # key values agree to the micro quantum
    want_micro = {d: round(g * 1_000_000) for g, d in want}
    for r in got:
        assert abs(r.gkey_micro - want_micro[r.doc_id]) <= 1, r


def test_gumbel_topk_deterministic_and_nested(spark):
    rows = [(i, float(i % 7)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    a = {r.doc_id for r in curation.gumbel_topk_sample(df, k=10, tau=1.0).collect()}
    b = {r.doc_id for r in curation.gumbel_topk_sample(df, k=10, tau=1.0).collect()}
    assert a == b and len(a) == 10
    # different salt -> (almost surely) different draw, same size
    c = {
        r.doc_id
        for r in curation.gumbel_topk_sample(
            df, k=10, tau=1.0, salt="other"
        ).collect()
    }
    assert len(c) == 10


def test_gumbel_topk_sharp_tau_is_plain_topk(spark):
    """tau -> 0 drowns the noise: the draw degenerates to exact top-k
    by weight."""
    rows = [(i, float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {
        r.doc_id
        for r in curation.gumbel_topk_sample(df, k=5, tau=1e-9).collect()
    }
    assert got == {45, 46, 47, 48, 49}


def test_gumbel_topk_plans_take_ordered(spark):
    """Scale assertion: the global top-k must plan TakeOrderedAndProject
    (per-partition heaps + k-row merge), never a global sort."""
    rows = [(i, float(i % 13)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = curation.gumbel_topk_sample(df, k=10, tau=1.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# round-8: sequence packing + advisor-fix guards
# ---------------------------------------------------------------------------


def test_sequence_packing_plan_semantics(spark):
    """Offsets are the exclusive prefix sum in doc_id order; chunk
    spans follow integer division; empty docs occupy no tokens and
    never straddle; capacity < 1 is rejected."""
    import pytest as _pytest

    from graphdb_testing_spark.functions.curation import sequence_packing_plan

    docs = spark.createDataFrame(
        [
            (1, "a b c"),          # 3 tokens  off 0   chunks 0-0
            (2, ""),               # 0 tokens  off 3   pinned to chunk 0
            (3, "d e f g"),        # 4 tokens  off 3   spans 0-1 (cap 4: 3..6)
            (4, "h"),              # 1 token   off 7   chunk 1
            (5, "i j k l m n"),    # 6 tokens  off 8   chunks 2-3
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in sequence_packing_plan(docs, capacity=4).collect()
    }
    want = {
        1: (3, 0, 0, 0, 1, 0),
        2: (0, 3, 0, 0, 1, 0),
        3: (4, 3, 0, 1, 2, 1),
        4: (1, 7, 1, 1, 1, 0),
        5: (6, 8, 2, 3, 2, 1),
    }
    for d, (n, off, fc, lc, nc, sp) in want.items():
        r = got[d]
        assert (
            r.n_tokens, r.start_off, r.first_chunk,
            r.last_chunk, r.n_chunks, r.spans_boundary,
        ) == (n, off, fc, lc, nc, sp), d
    with _pytest.raises(ValueError, match="capacity"):
        sequence_packing_plan(docs, capacity=0)


def test_ccnet_k_guard_and_fertility_null_safety(spark):
    import pytest as _pytest

    from graphdb_testing_spark.functions.curation import ccnet_perplexity_buckets
    from graphdb_testing_spark.functions.textstats import tokenizer_fertility

    docs = spark.createDataFrame(
        [(1, "a b", "en"), (2, "   ", "zz")],
        "doc_id long, text string, lang string",
    )
    with _pytest.raises(ValueError, match="k >= 2"):
        ccnet_perplexity_buckets(docs, k=1)
    # a language of only-whitespace docs: ratios are NULL, never inf
    rows = {r.lang: r for r in tokenizer_fertility(docs).collect()}
    assert rows["zz"].n_words == 0 and rows["zz"].pieces_per_word is None
    assert rows["zz"].n_pieces == 0 and rows["zz"].chars_per_piece is None
    assert rows["en"].pieces_per_word is not None


def test_source_unigram_kl_empty_corpus_returns_empty(spark):
    """SUM over zero rows is NULL; the collected corpus total must be
    guarded so an empty input yields an empty result with the right
    schema, not a TypeError."""
    from graphdb_testing_spark.functions.textstats import source_unigram_kl

    docs = spark.createDataFrame([], "source string, text string")
    out = source_unigram_kl(docs)
    assert out.columns == ["source", "n_tokens", "n_types", "kl_micro"]
    assert out.count() == 0
