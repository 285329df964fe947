"""Data-pipeline operators: dedup, similarity search, text stats,
multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_testing_spark.functions import dedup, multimodal, simsearch, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup
        (3, "the quick brown fox jumps over the lazy cat again and again"),  # near dup
        (4, "completely different content about spark query engines here"),
        (5, "der hund und die katze sind nicht der gleiche und das ist gut"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    marked = dedup.exact_duplicates(docs)
    canon = {r.doc_id: r.canonical_id for r in marked.collect()}
    assert canon[1] == 1 and canon[2] == 1  # 2 collapses into 1
    assert canon[3] == 3 and canon[4] == 4
    kept = sorted(r.doc_id for r in dedup.dedup_exact(docs).collect())
    assert kept == [1, 3, 4, 5]


def test_minhash_lsh_finds_near_dups(spark, docs):
    out = dedup.minhash_near_duplicates(docs, threshold=0.5)
    pairs = {(r.a_id, r.b_id): r.jaccard for r in out.collect()}
    assert pairs[(1, 2)] == 1.0  # exact dup -> jaccard 1
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.5  # near dup found
    assert all(a < b for a, b in pairs)


def test_jaccard_values(spark, docs):
    sh = dedup.char_shingles(docs)
    pairs = spark.createDataFrame([(1, 4)], "a_id long, b_id long")
    j = dedup.jaccard_for_pairs(sh, pairs).collect()[0]
    assert j.jaccard < 0.2  # unrelated docs


def test_simhash_close_for_near_dups(spark, docs):
    sh = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    assert sh[1] == sh[2]  # identical text, identical fingerprint
    ham13 = bin(sh[1] ^ sh[3]).count("1")
    ham14 = bin(sh[1] ^ sh[4]).count("1")
    assert ham13 < ham14  # near dup closer than unrelated
    assert all(0 <= v < 2**32 for v in sh.values())


def test_simhash_near_dup_full_recall(spark):
    """Pigeonhole banding must find EVERY pair within the Hamming
    budget — compare against the exact all-pairs popcount join on the
    real sf0.001 documents table (the prior top-16-bit-prefix blocking
    missed pairs whose differing bits landed in the prefix)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    sh = dedup.simhash(docs)
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("simhash").alias("ha"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("simhash").alias("hb"))
    exact = (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= 3)
    )
    want = {(r.a_id, r.b_id, r.hamming) for r in exact.collect()}
    got = {
        (r.a_id, r.b_id, r.hamming)
        for r in dedup.simhash_near_duplicates(docs, max_hamming=3).collect()
    }
    assert want, "fixture should contain at least one near-dup pair"
    assert got == want  # 100% recall AND precision


def test_text_stats_and_quality(spark, docs):
    stats = {r.doc_id: r for r in textstats.text_stats(docs).collect()}
    assert stats[1].n_tokens == 12
    assert stats[1].n_distinct_tokens == 10  # 'the'/'again' repeat
    q = {r.doc_id: r.quality for r in textstats.quality_score(docs).collect()}
    assert all(0 <= v <= 1 for v in q.values())


def test_language_id(spark, docs):
    pred = {r.doc_id: r.pred_lang for r in textstats.language_id(docs).collect()}
    assert pred[1] == "en"
    assert pred[5] == "de"


def test_fingerprint_stable_under_small_edit(spark, docs):
    fp = {r.doc_id: r.fingerprint for r in textstats.fingerprint(docs).collect()}
    assert fp[1] == fp[2]
    # winnowed min-hashes: near-dup shares some components
    assert len(set(fp[1].split("-")) & set(fp[3].split("-"))) >= 1


@pytest.fixture(scope="module")
def embeddings(spark):
    import math

    rows = []
    for i in range(60):
        base = [math.sin(0.1 * i * (d + 1)) for d in range(8)]
        rows.append((i, [float(x) for x in base], i % 3))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_cosine_topk_exact(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") == 0)
    out = simsearch.cosine_topk(embeddings, queries, k=5).collect()
    assert len(out) == 5
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]
    sims = [r.sim for r in out]
    assert sims == sorted(sims, reverse=True)
    assert all(r.vec_id != 0 for r in out)


def test_ivf_recall_vs_bruteforce(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") % 20 == 0)
    exact = {
        (r.query_id, r.vec_id)
        for r in simsearch.cosine_topk(embeddings, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in simsearch.ivf_topk(embeddings, queries, k=5, bucket_dims=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5  # coarse buckets, small data: sanity not SLA


def test_ivf_kmeans_topk_exact_when_probing_all_cells(spark, embeddings):
    """Probing every cell recovers brute force EXACTLY: the cell map
    partitions the corpus, so nprobe == n_cells means every candidate
    is scanned and the ranking (sim desc, vec_id) is the same total
    order cosine_topk uses — the containment argument that makes the
    IVF approximation's only error source the un-probed cells."""
    queries = embeddings.filter(F.col("vec_id") % 20 == 0)
    exact = {
        (r.query_id, r.rank, r.vec_id)
        for r in simsearch.cosine_topk(embeddings, queries, k=5).collect()
    }
    allprobe = {
        (r.query_id, r.rank, r.vec_id)
        for r in simsearch.ivf_kmeans_topk(
            embeddings, queries, k=5, n_cells=4, rounds=2, nprobe=4
        ).collect()
    }
    assert exact == allprobe


def test_ivf_kmeans_recall_vs_bruteforce(spark, embeddings):
    """At nprobe < n_cells the learned quantizer keeps recall sane on
    clustered data (the sinusoid fixture has real cluster structure),
    and every returned neighbor is a genuine corpus id."""
    queries = embeddings.filter(F.col("vec_id") % 20 == 0)
    exact = {
        (r.query_id, r.vec_id)
        for r in simsearch.cosine_topk(embeddings, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in simsearch.ivf_kmeans_topk(
            embeddings, queries, k=5, n_cells=4, rounds=2, nprobe=2
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5
    ids = {r.vec_id for r in embeddings.collect()}
    assert {b for (_, b) in approx} <= ids


def test_embedding_near_dups_include_self_similar(spark, embeddings):
    out = simsearch.embedding_near_duplicates(embeddings, threshold=0.99)
    assert all(r.sim >= 0.99 for r in out.collect())


def test_embedding_near_dups_guard_refuses_large_input(spark, embeddings, monkeypatch):
    # the exact all-pairs baseline must refuse big inputs and point at
    # the bucketed twin (contract guard, write_graph_file discipline)
    import pytest

    monkeypatch.setattr(simsearch, "MAX_EXACT_ALLPAIRS_ROWS", 3)
    with pytest.raises(ValueError, match="bucketed"):
        simsearch.embedding_near_duplicates(embeddings, threshold=0.99)


def test_bucketed_near_dups_recall_and_precision(spark, embeddings):
    exact = {
        (r.a_id, r.b_id): r.sim
        for r in simsearch.embedding_near_duplicates(
            embeddings, threshold=0.6
        ).collect()
    }
    approx = {
        (r.a_id, r.b_id): r.sim
        for r in simsearch.embedding_near_duplicates_bucketed(
            embeddings, threshold=0.6, bucket_dims=8
        ).collect()
    }
    # blocking only ever drops candidates: every reported pair must be
    # in the exact set with the identical sim (perfect precision)...
    assert set(approx) <= set(exact)
    assert all(exact[p] == s for p, s in approx.items())
    # ...and Hamming-1 multiprobe keeps recall high here: pairs at
    # cosine >= 0.6 rarely differ in >= 2 of the 8 leading sign bits
    assert len(exact) > 0
    recall = len(approx) / len(exact)
    assert recall >= 0.7


def test_bucketed_near_dups_plan_has_no_cross_join(spark, embeddings):
    plan = simsearch.embedding_near_duplicates_bucketed(
        embeddings, threshold=0.6
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hyperplane_lsh_signature_deterministic(spark, embeddings):
    a = {r.vec_id: r.sig for r in simsearch.hyperplane_lsh_signature(
        embeddings, num_planes=8, dim=8).collect()}
    b = {r.vec_id: r.sig for r in simsearch.hyperplane_lsh_signature(
        embeddings, num_planes=8, dim=8).collect()}
    assert a == b
    assert all(0 <= v < 256 for v in a.values())


def test_multimodal_feature_pipeline(spark, docs):
    media = multimodal.synthetic_media(docs, modality="image")
    feats = multimodal.extract_features(media, dim=16).collect()
    assert len(feats) == 5
    by_id = {r.media_id: r for r in feats}
    assert all(len(r.feature) == 16 for r in feats)
    # deterministic: same payload -> same feature
    assert by_id[1].feature == by_id[2].feature
    assert by_id[1].n_bytes == len(
        "the quick brown fox jumps over the lazy dog again and again"
    )


def test_multimodal_unknown_decode_stub_rejected(spark, docs):
    media = multimodal.synthetic_media(docs)
    with pytest.raises(ValueError, match="decode_stub"):
        multimodal.extract_features(media, decode_stub="error")


def test_png_roundtrip_exact_all_filters():
    """The PNG codec is real: encode→DEFLATE→decode→un-filter is the
    identity, with the encoder cycling all five scanline filter types
    so every un-filter branch is on the path; CRC corruption and
    unsupported flavors are rejected."""
    import numpy as np

    rng = np.random.default_rng(7)
    for shape in [(8, 8, 3), (1, 1, 3), (5, 13, 3), (16, 3, 3), (7, 1, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        data = multimodal.encode_png(px)
        assert data[:8] == multimodal.PNG_MAGIC
        assert np.array_equal(multimodal.decode_png(data), px)
    # >= 5 rows ⇒ filters 0..4 all present in the stream
    px = rng.integers(0, 256, size=(8, 4, 3), dtype=np.uint8)
    import zlib as _z

    data = multimodal.encode_png(px)
    idat_off = data.index(b"IDAT") + 4
    (ln,) = __import__("struct").unpack_from(">I", data, idat_off - 8)
    raw = _z.decompress(data[idat_off : idat_off + ln])
    stride = 4 * 3 + 1
    assert {raw[y * stride] for y in range(8)} == {0, 1, 2, 3, 4}
    # corruption is caught, not silently decoded
    bb = bytearray(data)
    bb[idat_off + 5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        multimodal.decode_png(bytes(bb))
    with pytest.raises(ValueError):
        multimodal.decode_png(b"\x89PNGnope")


def test_png_truncated_and_malformed_chunks_raise_valueerror():
    """Malformed chunk LENGTHS raise the codec's ValueError, never a
    leaked struct.error: (a) payload cut mid-chunk, (b) a declared
    length overrunning the buffer, (c) a short IHDR body."""
    import struct as _s

    import numpy as np

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    data = multimodal.encode_png(px)
    # (a) truncate inside the IDAT chunk body
    idat_off = data.index(b"IDAT")
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        multimodal.decode_png(data[: idat_off + 10])
    # (b) inflate the declared IDAT length past the end of the buffer
    bb = bytearray(data)
    bb[idat_off - 4 : idat_off] = _s.pack(">I", len(data))
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        multimodal.decode_png(bytes(bb))
    # (c) IHDR whose declared body is shorter than the 13-byte spec
    short_body = b"\x00" * 8
    fake = multimodal.PNG_MAGIC + multimodal._png_chunk(b"IHDR", short_body)
    with pytest.raises(ValueError, match="truncated PNG IHDR"):
        multimodal.decode_png(fake)


def test_png_real_codec_through_arrow_stage(spark, docs):
    """PNG payloads flow through the same mapInPandas stages as BMP:
    decode_checksums reproduces the pre-encode raster checksum
    (lossless round trip, distributed), and decode_stub='real'
    features match the BMP features of the SAME pixels."""
    import numpy as np

    bmp = multimodal.synthetic_real_media(docs, modality="image")
    png = multimodal.synthetic_real_media(
        docs, modality="image", image_codec="png"
    )
    for r in png.collect():  # the payloads are REAL compressed PNGs
        assert bytes(r.content)[:8] == multimodal.PNG_MAGIC
        assert multimodal.decode_png(bytes(r.content)).shape == (8, 8, 3)
    w_bmp = {
        r.media_id: r.wsum for r in multimodal.decode_checksums(bmp).collect()
    }
    w_png = {
        r.media_id: r.wsum for r in multimodal.decode_checksums(png).collect()
    }
    assert w_bmp == w_png  # same pixels, two codecs, one checksum
    f_bmp = {
        r.media_id: r.feature
        for r in multimodal.extract_features(bmp, 16, "real").collect()
    }
    f_png = {
        r.media_id: r.feature
        for r in multimodal.extract_features(png, 16, "real").collect()
    }
    for k in f_bmp:
        assert np.allclose(f_bmp[k], f_png[k], atol=1e-9)


def test_bmp_wav_roundtrip_exact():
    """The pure-stdlib codecs are real: encode→decode is the
    identity, including the BMP bottom-up/BGR/row-pad dance at a
    non-multiple-of-4 width."""
    import numpy as np

    px = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(5, 3, 3)  # w=3 ⇒ padded rows
    data = multimodal.encode_bmp(px)
    assert data[:2] == b"BM"
    assert np.array_equal(multimodal.decode_bmp(data), px)

    sig = (np.arange(-50, 50, dtype=np.int16)) * 300
    wav = multimodal.encode_wav(sig, rate=8000)
    out, rate = multimodal.decode_wav(wav)
    assert rate == 8000 and np.array_equal(out, sig)


def test_multimodal_real_codec_features(spark, docs):
    """decode_stub='real' actually decodes the payload: features
    match an independent per-payload reference computed driver-side
    from the same bytes, for both BMP and WAV payloads."""
    import numpy as np

    for modality in ("image", "audio"):
        media = multimodal.synthetic_real_media(docs, modality=modality)
        rows = media.collect()
        # the payloads are REAL files: stdlib decoders open them
        for r in rows:
            if modality == "image":
                assert multimodal.decode_bmp(bytes(r.content)).shape == (8, 8, 3)
            else:
                assert len(multimodal.decode_wav(bytes(r.content))[0]) == 256
        feats = {
            r.media_id: r
            for r in multimodal.extract_features(
                media, dim=16, decode_stub="real"
            ).collect()
        }
        for r in rows:
            want = multimodal._real_feature(bytes(r.content), 16)
            got = feats[r.media_id]
            assert got.n_bytes == len(bytes(r.content))
            assert np.allclose(got.feature, want, atol=1e-6), (
                modality,
                r.media_id,
            )


def test_multimodal_real_codec_rejects_opaque_bytes(spark, docs):
    media = multimodal.synthetic_media(docs)  # text bytes, no magic
    with pytest.raises(Exception) as exc:
        multimodal.extract_features(media, decode_stub="real").collect()
    assert "unknown payload magic" in str(exc.value)


def test_resize_bmp_real_kernel(spark, docs):
    """codec='bmp' re-encodes: output payloads decode to the target
    dims and equal the numpy nearest-neighbor reference."""
    import numpy as np

    media = multimodal.synthetic_real_media(docs, modality="image")
    out = {
        r.media_id: r
        for r in multimodal.resize_images(media, 4, 6, codec="bmp").collect()
    }
    for r in media.collect():
        px = multimodal.decode_bmp(bytes(r.content))
        ri = np.minimum((np.arange(6) + 0.5) * 8 // 6, 7).astype(int)
        ci = np.minimum((np.arange(4) + 0.5) * 8 // 4, 7).astype(int)
        want = px[np.ix_(ri, ci)]
        got = multimodal.decode_bmp(bytes(out[r.media_id].content))
        assert got.shape == (6, 4, 3)
        assert np.array_equal(got, want)
        assert out[r.media_id].meta.width == 4
        assert out[r.media_id].meta.height == 6


def test_frame_sampling(spark, docs):
    media = multimodal.synthetic_media(docs, modality="video")
    frames = multimodal.sample_frames(media, every_ms=100)
    one = frames.filter(F.col("media_id") == 1)
    # duration = len(text)*10 ms -> len/10 + 1 frames at 100ms
    n_chars = len("the quick brown fox jumps over the lazy dog again and again")
    assert one.count() == (n_chars * 10 - 1) // 100 + 1


def test_resize_rewrites_metadata_keeps_payload(spark, docs):
    media = multimodal.synthetic_media(docs, modality="image")
    out = multimodal.resize_images(media, 32, 24)
    row = out.filter(F.col("media_id") == 1).collect()[0]
    assert row.meta.width == 32 and row.meta.height == 24
    assert row.meta.codec == "synthetic"
    orig = media.filter(F.col("media_id") == 1).collect()[0]
    assert bytes(row.content) == bytes(orig.content)


def test_repeated_spans_exact_vs_bruteforce(spark):
    """Spans must match a brute-force window scan: same sampled
    positions, same hashes, same per-span doc/occurrence counts —
    including a doc that repeats the shared span twice."""
    import hashlib

    rows = [
        (1, "the quick brown fox jumps over the lazy dog pack"),
        (2, "XX the quick brown fox jumps over the lazy dog YY"),
        (3, "completely unrelated text with no overlap at all!"),
        # second copy starts at offset 50 — stride-aligned (even), so
        # both copies sample the same window phase and collide
        (4, "the quick brown fox jumps over the lazy dog pack  "
            "the quick brown fox jumps over the lazy dog pack"),
        (5, "short"),  # < span_len: contributes nothing
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    L, S = 16, 2
    got = {
        r.span_hash: (r.n_docs, r.n_occ)
        for r in dedup.repeated_spans(
            docs, span_len=L, stride=S, min_docs=2
        ).collect()
    }

    from collections import defaultdict

    occ = defaultdict(list)
    for doc_id, text in rows:
        for i in range(0, len(text) - L + 1, S):  # positions 1,1+S,... (0-based)
            h = int(hashlib.md5(text[i : i + L].encode()).hexdigest()[:15], 16)
            occ[h].append(doc_id)
    want = {
        h: (len(set(ds)), len(ds)) for h, ds in occ.items() if len(set(ds)) >= 2
    }
    assert got == want and len(got) > 0
    # doc 4 repeats the shared prefix: some span must have n_occ > n_docs
    assert any(n_occ > n_docs for n_docs, n_occ in got.values())


def test_remove_repeated_spans_vs_bruteforce(spark):
    """Cleaned text must match a brute-force splice: same sampled
    windows, same repeated set, overlapping hits merged — including a
    doc that is entirely boilerplate (→ empty), a doc repeating the
    span twice, and a doc below span_len (→ untouched)."""
    boiler = "SUBSCRIBE TO OUR NEWSLETTER TODAY FRIENDS"
    rows = [
        (1, "alpha " + boiler + " omega unique one"),
        # separator length chosen so both copies sample on the same
        # stride-3 phase as docs 1 and 4 (6 ≡ 6+41+7 ≡ 0 mod 3)
        (2, "start " + boiler + " middl " + boiler + " end"),
        (3, "totally unrelated document with no repeats at all"),
        (4, boiler),
        (5, "short"),
    ]
    docs_df = spark.createDataFrame(rows, "doc_id long, text string")
    L, S = 8, 3  # stride > 1: hit positions are sample-aligned

    win: dict[str, set[int]] = {}
    for d, t in rows:
        for i in range(0, len(t) - L + 1, S):
            win.setdefault(t[i : i + L], set()).add(d)
    rep = {w for w, ds in win.items() if len(ds) >= 2}

    def clean(t: str) -> str:
        if len(t) < L:
            return t
        pos, out = 0, []
        for i in range(0, len(t) - L + 1, S):
            if t[i : i + L] in rep:
                if i > pos:
                    out.append(t[pos:i])
                pos = max(pos, i + L)
        out.append(t[pos:])
        return "".join(out)

    got = {
        r.doc_id: (r.clean_text, r.removed_chars)
        for r in dedup.remove_repeated_spans(docs_df, span_len=L, stride=S).collect()
    }
    assert set(got) == {d for d, _ in rows}  # every doc present
    for d, t in rows:
        want = clean(t)
        assert got[d] == (want, len(t) - len(want)), (d, got[d], want)
    assert got[3][0] == rows[2][1]  # untouched doc unchanged
    assert got[4][0] == ""  # all-boilerplate doc emptied
    assert got[2][1] > len(boiler)  # both copies excised


def test_jaccard_prefix_join_exact_vs_bruteforce(spark, docs):
    """Prefix filtering must find EVERY qualifying pair (completeness
    theorem) — compare against the in-test brute force."""
    from itertools import combinations

    got = {(r.a_id, r.b_id): r.jaccard
           for r in dedup.jaccard_prefix_join(docs, threshold=0.3).collect()}
    texts = {r.doc_id: set(r.text.split()) for r in docs.collect()}
    want = {}
    for a, b in combinations(sorted(texts), 2):
        j = len(texts[a] & texts[b]) / len(texts[a] | texts[b])
        if round(j, 6) >= 0.3:
            want[(a, b)] = round(j, 6)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_pq_adc_approximates_exact_ranking(spark):
    """PQ-ADC top-1 must be a genuinely close neighbor: its exact
    integerized distance is within 4x of the true nearest non-query
    vector's distance for every query (coarse but codebook-free
    bound on a 16-codeword quantizer)."""
    from graphdb_testing_spark.queries import all_queries
    import graphdb_testing_spark.queries_pipeline  # noqa: F401

    sf = "/root/testdata/sf0.001"
    adc = all_queries()["pq_adc_topk"](spark, sf).filter(F.col("rank") == 1)
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(floor(cast(x as double) * 1024) as bigint))"
        ).alias("iv"),
    )
    import itertools

    vecs = {r.vec_id: r.iv for r in emb.collect()}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    for r in adc.collect():
        q = vecs[r.q_id]
        true_best = min(
            d2(q, v) for vid, v in vecs.items()
            if vid != r.q_id and not (16 <= vid < 21)
        )
        got = d2(q, vecs[r.vec_id])
        assert got <= max(4 * true_best, true_best + 1)


def test_power_iteration_matches_numpy_eigenvector(spark):
    # planted dominant direction (the sin fixture's spectrum is nearly
    # degenerate, where power iteration legitimately stalls)
    import math

    import numpy as np

    from graphdb_testing_spark.operators.pca import power_iteration_loadings

    rng = np.random.default_rng(7)
    u = rng.normal(size=8)
    u /= np.linalg.norm(u)
    X32 = (
        rng.normal(size=(80, 1)) * 3.0 * u + 0.1 * rng.normal(size=(80, 8))
    ).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X32[i]], 0) for i in range(len(X32))],
        "vec_id long, embedding array<float>, label int",
    )
    out = power_iteration_loadings(df, dim=8, rounds=12).collect()
    got = np.array(
        [r["loading_micro"] for r in sorted(out, key=lambda r: r["dim"])],
        dtype=float,
    ) / 1e6

    X = np.floor(X32.astype(np.float64) * 1024)
    C = len(X) * (X.T @ X) - np.outer(X.sum(0), X.sum(0))
    w, v = np.linalg.eigh(C)
    top = v[:, np.argmax(w)]
    top = top / top[np.argmax(np.abs(top))]
    assert np.max(np.abs(got - top)) < 1e-3


def test_kmeans_lloyd_recovers_planted_clusters(spark):
    import numpy as np

    from graphdb_testing_spark.functions.simsearch import kmeans_lloyd

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(3, 8)) * 5.0
    rows = []
    truth = []
    for i in range(90):
        g = i % 3
        truth.append(g)
        v = centers[g] + 0.2 * rng.normal(size=8)
        rows.append((i, [float(x) for x in v.astype(np.float32)], g))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = kmeans_lloyd(df, k=3, rounds=4).collect()
    by_id = {r["vec_id"]: r["cluster_id"] for r in out}
    # same planted group → same final cluster, different → different
    for i in range(90):
        for j in (0, 1, 2):
            same = truth[i] == truth[j]
            assert (by_id[i] == by_id[j]) == same


def test_arrow_assign_parity(spark, embeddings):
    """The BLAS (mapInPandas float64) nearest-centroid path must be
    BIT-IDENTICAL to the Catalyst bigint path — same cluster_id AND
    same dist2 for every point, including the lowest-cluster_id
    tie-break.  f64 is exact here because every intermediate is an
    integer < 2^53 (guarded by _F64_EXACT_BOUND); this test pins the
    claim on real float32 embeddings.  The `k` argument only selects
    the physical plan, so the same centroid relation runs both."""
    from graphdb_testing_spark.functions.simsearch import (
        _ARROW_ASSIGN_MIN_CELLS,
        _assign_cells,
        _integerize,
        _lloyd_iterate,
    )

    pts = _integerize(embeddings, "vec_id", "embedding").localCheckpoint()
    _, cents = _lloyd_iterate(pts, 6, 2)
    catalyst = {
        (r.vec_id, r.cluster_id, r.dist2)
        for r in _assign_cells(pts, cents, k=6).collect()
    }
    arrow = {
        (r.vec_id, r.cluster_id, r.dist2)
        for r in _assign_cells(
            pts, cents, k=_ARROW_ASSIGN_MIN_CELLS
        ).collect()
    }
    assert catalyst == arrow
    assert len(catalyst) == embeddings.count()


def test_arrow_assign_tie_break_lowest_cluster_id(spark):
    """Two centroids exactly equidistant from a point: both paths must
    pick the LOWER cluster_id (np.argmin first-index == min(struct)
    lexicographic, because the centroid matrix is sorted)."""
    from graphdb_testing_spark.functions.simsearch import (
        _ARROW_ASSIGN_MIN_CELLS,
        _assign_cells,
    )

    pts = spark.createDataFrame(
        [(0, [0, 0]), (1, [10, 0])], "vec_id long, p array<bigint>"
    )
    # centroids at ±1000 (milli units) on axis 0: the origin point is
    # exactly equidistant; point 1 is strictly nearer cluster 7
    cents = spark.createDataFrame(
        [(7, [1000, 0]), (3, [-1000, 0])], "cluster_id long, c array<bigint>"
    )
    for k in (2, _ARROW_ASSIGN_MIN_CELLS):
        got = {
            r.vec_id: r.cluster_id
            for r in _assign_cells(pts, cents, k=k).collect()
        }
        assert got == {0: 3, 1: 7}, (k, got)


def test_arrow_assign_rejects_out_of_exact_range(spark):
    """Components beyond the f64-exact bound must fail loudly (the
    BLAS path refuses rather than silently drifting from the bigint
    metric)."""
    import pytest as _pytest

    from graphdb_testing_spark.functions.simsearch import (
        _ARROW_ASSIGN_MIN_CELLS,
        _assign_cells,
    )

    big = 1 << 40
    pts = spark.createDataFrame([(0, [big, 0])], "vec_id long, p array<bigint>")
    cents = spark.createDataFrame(
        [(0, [0, 0])], "cluster_id long, c array<bigint>"
    )
    with _pytest.raises(Exception, match="f64-exact range"):
        _assign_cells(pts, cents, k=_ARROW_ASSIGN_MIN_CELLS).collect()
    # centroid-side guard trips driver-side, before any job runs
    with _pytest.raises(ValueError, match="f64-exact range"):
        _assign_cells(
            spark.createDataFrame([(0, [0, 0])], "vec_id long, p array<bigint>"),
            spark.createDataFrame(
                [(0, [big, 0])], "cluster_id long, c array<bigint>"
            ),
            k=_ARROW_ASSIGN_MIN_CELLS,
        )


def test_arrow_gram_matches_exact_integer_covariance(spark):
    """The mapInPandas partial-Gram path (float, scale shape) must
    agree with the exact integer pair-explode covariance numerator
    after integerizing the same way."""
    import numpy as np

    from graphdb_testing_spark.operators.pca import _cov_matrix, gram_matrix_arrow

    rng = np.random.default_rng(3)
    X32 = rng.normal(size=(70, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X32[i]], 0) for i in range(len(X32))],
        "vec_id long, embedding array<float>, label int",
    )
    # integerized input so the Gram and the covariance numerator share
    # a basis: feed the 1024-scaled floors as floats
    Xi = np.floor(X32.astype(np.float64) * 1024)
    dfi = spark.createDataFrame(
        [(i, [float(x) for x in Xi[i]], 0) for i in range(len(Xi))],
        "vec_id long, embedding array<float>, label int",
    )
    gram = {
        (r["i"], r["j"]): r["g"]
        for r in gram_matrix_arrow(dfi, dim=8).collect()
    }
    n = len(Xi)
    sx = Xi.sum(0)
    cov = {
        (r["i"], r["j"]): r["a"] for r in _cov_matrix(df, 8).collect()
    }
    for (i, j), g in gram.items():
        want = n * g - sx[i - 1] * sx[j - 1]
        assert abs(cov[(i, j)] - want) <= 1e-6 * max(1.0, abs(want))


def test_python_udtf_chunking_matches_native(spark):
    """Spark 4 Python UDTF surface: a chunk-expanding UDTF must agree
    with the native sequence/transform expression (UDTFs are the
    escape hatch for row-to-rows logic the built-ins can't express;
    this pins the API and the parity)."""
    import pyspark.sql.functions as SF
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="doc_id long, start long, length long")
    class Chunker:
        def eval(self, doc_id: int, n: int, size: int):
            s = 0
            while s < n:
                yield doc_id, s, min(size, n - s)
                s += size

    spark.udtf.register("chunker", Chunker)
    spark.createDataFrame(
        [(1, 10), (2, 7), (3, 3)], "doc_id long, n long"
    ).createOrReplaceTempView("udtf_docs")
    got = sorted(
        map(
            tuple,
            spark.sql(
                "SELECT c.doc_id, c.start, c.length FROM udtf_docs d,"
                " LATERAL chunker(d.doc_id, d.n, 4) c"
            ).collect(),
        )
    )
    native = sorted(
        map(
            tuple,
            spark.table("udtf_docs")
            .select(
                "doc_id",
                SF.explode(
                    SF.expr("transform(sequence(0, cast((n + 3) div 4 as int) - 1),"
                            " i -> struct(i * 4 as start,"
                            " least(4, n - i * 4) as length))")
                ).alias("c"),
            )
            .select("doc_id", "c.start", "c.length")
            .collect(),
        )
    )
    assert got == native and len(got) == 3 + 2 + 1


def test_semantic_dedup_pairs_subset_of_exact(spark, embeddings):
    """Cluster blocking can only MISS pairs (both endpoints must land
    in one cluster), never invent them: blocked ⊆ exact at the same
    threshold, with identical similarity values."""
    exact = {
        (r.a_id, r.b_id): r.sim
        for r in simsearch.embedding_near_duplicates(
            embeddings, threshold=0.6
        ).collect()
    }
    blocked = {
        (r.a_id, r.b_id): r.sim
        for r in simsearch.semantic_dedup_pairs(
            embeddings, threshold=0.6, k=4
        ).collect()
    }
    assert set(blocked) <= set(exact)
    for pair, sim in blocked.items():
        assert sim == exact[pair]


def test_semdedup_k_scales_with_corpus():
    """k must grow linearly with n (round-3 verdict item 3): fixed k
    makes blocking a constant-factor discount, not a complexity
    class."""
    assert simsearch.derive_semdedup_k(100) == 8  # floor for tiny inputs
    assert simsearch.derive_semdedup_k(4096 * 100) == 100
    assert simsearch.derive_semdedup_k(4096 * 100 + 1) == 101
    assert (
        simsearch.derive_semdedup_k(10**9)
        == -(-(10**9) // 4096)
        > simsearch.derive_semdedup_k(10**8)
    )
    # tighter target ⇒ more clusters
    assert simsearch.derive_semdedup_k(1000, target_cluster_size=10) == 100


def test_semantic_dedup_default_k_derived(spark, embeddings):
    """k=None derives k from the corpus (floor 8 at 60 rows) and the
    result still equals the pinned-k run — derivation changes only
    WHICH k is used, not the semantics."""
    auto = simsearch.semantic_dedup_pairs(embeddings, threshold=0.6).collect()
    pinned = simsearch.semantic_dedup_pairs(
        embeddings, threshold=0.6, k=8
    ).collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, pinned))
    # a small target_cluster_size forces k past the floor: more
    # clusters ⇒ the blocked pair set can only shrink or hold
    tight = simsearch.semantic_dedup_pairs(
        embeddings, threshold=0.6, target_cluster_size=5
    ).collect()
    assert {(r.a_id, r.b_id) for r in tight} <= {
        (r.a_id, r.b_id)
        for r in simsearch.embedding_near_duplicates(
            embeddings, threshold=0.6
        ).collect()
    }


def test_semantic_dedup_plan_has_no_cross_join(spark, embeddings):
    plan = simsearch.semantic_dedup_pairs(
        embeddings, threshold=0.6, k=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cosine_topk_guard_refuses_large_query_set(spark, embeddings, monkeypatch):
    import pytest

    monkeypatch.setattr(simsearch, "MAX_BRUTE_QUERY_ROWS", 3)
    with pytest.raises(ValueError, match="ivf_topk"):
        simsearch.cosine_topk(embeddings, embeddings, k=5)


def test_token_freq_spectrum_bruteforce(spark):
    """Spectrum and Good-Turing adjusted counts vs a Python reference."""
    from collections import Counter

    from graphdb_testing_spark.functions import textstats

    texts = ["a a a b b c", "a b d", "c c e", "f"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    counts = Counter(w for t in texts for w in t.split(" "))
    spec = Counter(counts.values())  # r -> n_types
    want = {}
    for r, n in spec.items():
        nxt = spec.get(r + 1)
        gt = round(1e6 * (r + 1) * nxt / n) if nxt else None
        want[r] = (n, gt)
    got = {
        r.freq: (r.n_types, r.gt_adjusted_micro)
        for r in textstats.token_freq_spectrum(docs).collect()
    }
    assert got == want
    # sanity: total tokens reconstructed from the spectrum
    assert sum(r * n for r, (n, _) in got.items()) == sum(counts.values())


def test_gopher_quality_rules_bruteforce(spark):
    """Each Gopher rule exercised against hand-computed values,
    including the line/symbol rules the synthetic corpus never
    triggers (bullets, ellipses, newlines, hash symbols)."""
    from graphdb_testing_spark.functions import textstats

    good = " ".join(
        ["the", "be", "to", "of"] + ["word"] * 60
    )  # 64 words, all alpha, 4 stopwords
    bullets = "\n".join(["• item one", "• item two", "- item three", "end"])
    ellipses = "so it goes...\nand on...\nplainly\nmore..."
    symbols = "# ".join(["tag"] * 30)  # '#' every other word
    short = "tiny doc"
    numeric = " ".join(["123"] * 80 + ["the", "be"])  # words lack alpha
    docs = spark.createDataFrame(
        [
            (0, good),
            (1, bullets),
            (2, ellipses),
            (3, symbols),
            (4, short),
            (5, numeric),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in textstats.gopher_quality(docs).collect()}

    assert rows[0].n_words == 64
    assert rows[0].n_stop_present == 4
    assert rows[0].alpha_word_frac == 1.0
    assert rows[0].gopher_pass == 1

    assert rows[1].bullet_line_frac == 0.75  # 3 of 4 lines
    # whitespace tokenization: newlines are word separators, so the
    # bullets doc counts 10 words (no "one\n•"-style glued tokens)
    assert rows[1].n_words == 10
    assert rows[2].ellipsis_line_frac == 0.75  # 3 of 4 lines end ...
    assert rows[2].gopher_pass == 0

    # '# ' joined: 29 hashes over 59 words -> ratio > 0.1
    assert rows[3].symbol_word_ratio > 0.1
    assert rows[4].n_words == 2 and rows[4].gopher_pass == 0

    r5 = rows[5]
    assert r5.alpha_word_frac == round(2 / 82, 6)
    assert r5.n_stop_present == 2
    assert r5.gopher_pass == 0  # fails rule 6 despite stopwords

    # mean word length exact: good doc = (3+2+2+2 + 4*60)/64
    assert rows[0].mean_word_len == round((3 + 2 + 2 + 2 + 4 * 60) / 64, 6)


def test_gopher_repetition_rules_bruteforce(spark):
    """Each repetition signal against hand-computed values: duplicate
    lines (count and char share), densest 2/3/4-gram coverage with
    overlap counting, degenerate docs (empty, single word)."""
    from graphdb_testing_spark.functions import textstats

    docs = spark.createDataFrame(
        [
            (0, "a b\na b\nc d\ne f"),  # "a b" line twice
            (1, "x y x y x y x y"),  # one 2-gram dominates, overlaps
            (2, "unique words only here now"),
            (3, ""),
            (4, "w"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in textstats.gopher_repetition(docs).collect()}

    # doc 0: 4 lines, one duplicated -> (4-3)/4; dup chars 6 of 12
    assert rows[0].dup_line_frac == 0.25
    assert rows[0].dup_line_char_frac == 0.5
    # "a b" occurs twice in [a b a b c d e f] -> 2*3 / len 15
    assert rows[0].top2gram_char_frac == 0.4

    # doc 1: "x y" at 4 positions -> 4*3/15; the 4-gram "x y x y"
    # occurs 3 OVERLAPPING times -> 3*7/15 > 1, fails the rule harder
    assert rows[1].top2gram_char_frac == 0.8
    assert rows[1].top4gram_char_frac == round(21 / 15, 6)
    assert rows[1].repetition_pass == 0

    # no repetition anywhere: line rules pass, short-text n-gram
    # coverage is high by construction (5 words), so only the line
    # rules and nothing-repeats fractions are asserted
    assert rows[2].dup_line_frac == 0.0 and rows[2].dup_line_char_frac == 0.0

    # degenerate docs: all signals 0, full pass
    for d in (3, 4):
        assert rows[d].n_rep_rules_passed == 5
        assert rows[d].repetition_pass == 1


def test_dedup_retention_manifest(spark):
    """Retention semantics on a constructed corpus: exact duplicates
    cluster together under one canonical id; distinct docs are
    singletons; every document appears exactly once in the manifest."""
    from graphdb_testing_spark.functions import dedup

    base = " ".join(f"tok{i}" for i in range(40))
    variant = base.replace("tok7", "tok7x")  # near-dup, Jaccard >> 0.8
    others = [
        " ".join(f"w{j}_{i}" for i in range(30)) for j in range(4)
    ]
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, variant), (10, others[0]),
         (11, others[1]), (12, others[2]), (13, others[3])],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dedup.dedup_retention(docs, 0.8).collect()}
    assert len(rows) == 7  # one manifest row per document

    # the duplicate trio clusters under the min id, only it is kept
    assert rows[0].cluster_id == rows[1].cluster_id == rows[2].cluster_id == 0
    assert rows[0].cluster_size == 3
    assert (rows[0].keep, rows[1].keep, rows[2].keep) == (1, 0, 0)

    # distinct docs: singleton clusters of themselves, all kept
    for d in (10, 11, 12, 13):
        assert rows[d].cluster_id == d
        assert rows[d].cluster_size == 1
        assert rows[d].keep == 1

    # canonical invariant: cluster_id is the min doc_id of its cluster
    by_cluster = {}
    for r in rows.values():
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    for cid, members in by_cluster.items():
        assert cid == min(members)


def test_dedup_retention_no_duplicates(spark):
    """Empty duplicate graph: every document is its own kept
    singleton (the CC kernel must tolerate an empty edge set)."""
    from graphdb_testing_spark.functions import dedup

    docs = spark.createDataFrame(
        [(i, " ".join(f"u{i}_{j}" for j in range(25))) for i in range(5)],
        "doc_id long, text string",
    )
    out = dedup.dedup_retention(docs, 0.8).collect()
    assert len(out) == 5
    assert all(r.keep == 1 and r.cluster_size == 1 and r.cluster_id == r.doc_id
               for r in out)


def test_dedup_retention_exact_collapse_parity(spark):
    """Heavy exact duplication: the collapse-first pipeline must
    produce the same manifest the uncollapsed pipeline would — exact
    copies join their content's near-dup cluster, multiplicity lands
    in cluster_size, and only the global min id is kept."""
    from graphdb_testing_spark.functions import dedup

    base = " ".join(f"tok{i}" for i in range(40))
    near = base.replace("tok39", "tok39x")    # near-dup: one token differs
    other = " ".join(f"z{i}" for i in range(30))
    rows = (
        [(i, base) for i in range(0, 5)]       # 5 exact copies
        + [(i, near) for i in range(10, 13)]   # 3 exact copies of the near-dup
        + [(i, other) for i in range(20, 22)]  # 2 copies of unrelated content
        + [(30, "tiny"), (31, "tiny")]         # short texts: never paired
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dedup.dedup_retention(docs, 0.8).collect()}
    assert len(got) == 12

    # base+near contents merge: one cluster of 8, canonical id 0
    for d in list(range(0, 5)) + list(range(10, 13)):
        assert got[d].cluster_id == 0 and got[d].cluster_size == 8
        assert got[d].keep == (1 if d == 0 else 0)

    # unrelated exact pair: its own cluster of 2
    assert got[20].cluster_id == 20 and got[20].cluster_size == 2
    assert (got[20].keep, got[21].keep) == (1, 0)

    # sub-k texts carry no shingles: singletons even when identical
    for d in (30, 31):
        assert got[d].cluster_id == d and got[d].cluster_size == 1
        assert got[d].keep == 1


def test_semdedup_retention_invariants(spark):
    """Manifest invariants on real embeddings: one row per vector,
    cluster_id is the min member id, keep marks exactly the canonical,
    and cluster sizes are consistent with membership counts."""
    from graphdb_testing_spark.datasets import load_table
    from graphdb_testing_spark.functions import simsearch

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = simsearch.semdedup_retention(emb, threshold=0.4, k=8).collect()
    assert len(rows) == emb.count()

    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        ids = [m.vec_id for m in members]
        assert cid == min(ids)
        assert all(m.cluster_size == len(ids) for m in members)
        assert sorted(m.keep for m in members) == [0] * (len(ids) - 1) + [1]
        assert next(m for m in members if m.keep == 1).vec_id == cid
    assert any(len(m) > 1 for m in by_cluster.values())  # real dups exist


@pytest.mark.parametrize(
    "name",
    [
        "dedup_retention_clusters",
        "dedup_retention_keep_longest",
        "minhash_signature_pairs",
        "semdedup_retention",
        "gopher_quality_flags",
        # corpus_retention_report is excluded: it ENDS in a global
        # scalar aggregate (one output row), whose final
        # single-partition exchange receives only map-side-combined
        # partials — the legal scalar-rollup pattern, not a data-sized
        # global stage.
    ],
)
def test_round6_pipeline_query_plans_scale_safe(spark, name):
    """No ``Exchange SinglePartition`` in the plan of the round-6
    pipeline queries — locks in the manual plan audits (the round-5
    verdict's regression class: new code quietly planning a
    single-task global stage)."""
    import __spark_entry__  # noqa: F401  (registers all query modules)

    from graphdb_testing_spark.queries import all_queries

    df = all_queries()[name](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, name


def test_dedup_retention_keep_longest(spark):
    """keep_policy='longest': the kept member is the longest text in
    the cluster (ties to smallest id); cluster identity (min id) and
    sizes are unchanged from the default policy."""
    from graphdb_testing_spark.functions import dedup

    base = " ".join(f"tok{i}" for i in range(40))
    near = base.replace("tok39", "tok39x")  # near-dup, one char LONGER
    rows = (
        [(i, base) for i in range(0, 5)]
        + [(i, near) for i in range(10, 13)]
        + [(20, "solo " + " ".join(f"z{i}" for i in range(30)))]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in dedup.dedup_retention(docs, 0.8, keep_policy="longest").collect()
    }
    # cluster key stays the min id; the WINNER moves to the longest text
    for d in list(range(0, 5)) + list(range(10, 13)):
        assert got[d].cluster_id == 0 and got[d].cluster_size == 8
        assert got[d].keep == (1 if d == 10 else 0)  # longest, min id among ties
    assert got[20].keep == 1 and got[20].cluster_size == 1


# ---------------------------------------------------------------------------
# prototype pruning (Sorscher et al. 2022), D4, SoftDeDup commonness
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def small_embeddings(spark):
    import math

    rows = []
    for i in range(40):
        # four well-separated direction groups + in-group jitter so
        # Lloyd converges to meaningful prototypes
        g = i % 4
        base = [0.0] * 8
        base[g * 2] = 1.0
        base[g * 2 + 1] = 0.5
        vec = [v + 0.01 * ((i * 7 + j) % 5) for j, v in enumerate(base)]
        n = math.sqrt(sum(x * x for x in vec))
        rows.append((i, [x / n for x in vec]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_prototype_pruning_keep_rule(spark, small_embeddings):
    out = simsearch.prototype_pruning(
        small_embeddings, k=4, rounds=2, keep_num=1, keep_den=2
    ).collect()
    assert len(out) == 40  # one manifest row per input
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, rows in by_cluster.items():
        n = len(rows)
        ranks = sorted(r.proto_rank for r in rows)
        assert ranks == list(range(1, n + 1)), (cid, ranks)
        kept = [r for r in rows if r.keep == 1]
        assert len(kept) == (n + 1) // 2  # ceil(n/2)
        # the keep set is exactly the hardest (largest-dist2) ranks
        assert {r.proto_rank for r in kept} == set(range(1, len(kept) + 1))
        hardest = max(rows, key=lambda r: (r.dist2, -r.vec_id))
        assert hardest.keep == 1  # farthest point always survives


def test_d4_retention_composition(spark, small_embeddings):
    out = simsearch.d4_retention(
        small_embeddings, threshold=0.95, k=4, rounds=2
    ).collect()
    assert len(out) == 40
    for r in out:
        if r.keep == 1:
            assert r.sem_keep == 1 and r.proto_rank >= 1
        if r.sem_keep == 0:
            # dropped at stage 1 -> no prototype stage fields
            assert r.proto_cluster == -1 and r.proto_rank == -1 and r.keep == 0
    # stage-2 ran on survivors only: every survivor has a rank
    surv = [r for r in out if r.sem_keep == 1]
    assert all(r.proto_rank >= 1 for r in surv)
    # ceiling rule per proto cluster among survivors
    by_cluster = {}
    for r in surv:
        by_cluster.setdefault(r.proto_cluster, []).append(r)
    for cid, rows in by_cluster.items():
        assert sum(r.keep for r in rows) == (len(rows) + 1) // 2


def test_softdedup_commonness_scores(spark, docs):
    out = {r.doc_id: r for r in dedup.softdedup_commonness(docs, k=4).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    # identical documents get identical commonness
    assert out[1].sum_logf_micro == out[2].sum_logf_micro
    assert out[1].n_grams == out[2].n_grams == 12 - 4 + 1
    # duplicated content is MORE common than unique content
    assert out[1].avg_logf_micro > out[4].avg_logf_micro
    # integer mean is consistent
    for r in out.values():
        assert r.avg_logf_micro == r.sum_logf_micro // r.n_grams


def test_tokenizer_fertility(spark):
    rows = [(1, "ab cd!", "en"), (2, "hello world", "en"), (3, "x1 y2", "zh")]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.lang: r for r in textstats.tokenizer_fertility(d).collect()}
    en, zh = out["en"], out["zh"]
    # "ab cd!" -> pieces [ab, cd, !]; "hello world" -> [hello, world]
    assert en.n_docs == 2 and en.n_chars == 17 and en.n_words == 4
    assert en.n_pieces == 5
    assert en.pieces_per_word == round(5 / 4, 6)
    # "x1 y2" -> pieces [x, 1, y, 2] (letter/digit runs split)
    assert zh.n_pieces == 4 and zh.n_words == 2 and zh.n_chars == 5
    assert zh.chars_per_piece == round(5 / 4, 6)


def test_ccnet_buckets_invariants(spark):
    from graphdb_testing_spark.functions import curation

    rows = []
    # two languages, clearly-fluent vs gibberish docs
    for i in range(6):
        rows.append((i, "the cat sat on the mat and the cat sat", "en"))
    rows.append((6, "zzz qqq xxx www vvv uuu ttt sss rrr", "en"))
    rows.append((7, "zzz qqq xxx www vvv uuu ttt sss rrr", "en"))
    rows.append((8, "der hund lief durch den park und der hund", "de"))
    rows.append((9, "der hund lief durch den park und der hund", "de"))
    rows.append((10, "qwe rty uio pas dfg hjk", "de"))
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = curation.ccnet_perplexity_buckets(d, k=3).collect()
    assert len(out) == 11
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        sizes = {}
        for r in rs:
            sizes[r.ppl_bucket] = sizes.get(r.ppl_bucket, 0) + 1
        # ntile balance: bucket sizes differ by at most 1
        assert max(sizes.values()) - min(sizes.values()) <= 1, (lang, sizes)
        # head docs are at least as fluent as tail docs
        head_min = min(r.avg_logp_micro for r in rs if r.bucket_label == "head")
        tail_max = max(r.avg_logp_micro for r in rs if r.bucket_label == "tail")
        assert head_min >= tail_max, (lang, head_min, tail_max)
    # the repeated fluent sentence outranks the gibberish in en
    en = {r.doc_id: r.bucket_label for r in by_lang["en"]}
    assert en[0] == "head" and en[6] == "tail"


def test_lsh_s_curve_calibration(spark, docs):
    out = sorted(dedup.lsh_s_curve(docs).collect(), key=lambda r: r.j_bucket)
    assert out, "no buckets"
    # theory is monotone nondecreasing in the bucket and stays in [0,1]
    ps = [r.p_theory for r in out]
    assert all(0.0 <= p <= 1.0 for p in ps)
    assert all(a <= b for a, b in zip(ps, ps[1:]))
    for r in out:
        assert 0 <= r.n_detected <= r.n_true
        assert abs(r.detect_rate - r.n_detected / r.n_true) < 1e-9
    # the exact-duplicate pair (docs 1,2; J = 1) lands in the top
    # bucket, where every band must collide: theory 1, measured 1
    top = out[-1]
    assert top.j_bucket == 20 and top.p_theory == 1.0
    assert top.detect_rate == 1.0


def test_resize_png_real_kernel(spark, docs):
    """codec='png' re-encodes through the full compressed cycle:
    decode -> nearest-neighbor resample -> re-encode; decoded output
    equals the BMP resize kernel on the same pixels."""
    import numpy as np

    bmp = multimodal.synthetic_real_media(docs, modality="image")
    png = multimodal.synthetic_real_media(
        docs, modality="image", image_codec="png"
    )
    out_b = {
        r.media_id: multimodal.decode_bmp(bytes(r.content))
        for r in multimodal.resize_images(bmp, 4, 6, codec="bmp").collect()
    }
    out_p = {
        r.media_id: multimodal.decode_png(bytes(r.content))
        for r in multimodal.resize_images(png, 4, 6, codec="png").collect()
    }
    assert set(out_b) == set(out_p)
    for k in out_b:
        assert out_b[k].shape == (6, 4, 3)
        assert np.array_equal(out_b[k], out_p[k])


def test_shared_span_pairs_semantics_and_df_cap(spark):
    from graphdb_testing_spark.functions.dedup import shared_span_pairs

    span = "one two three four five"
    docs = spark.createDataFrame(
        [
            (1, f"{span} tail a"),
            (2, f"head {span}"),
            (3, "completely different words here entirely now"),
            (4, f"{span} another"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.a_id, r.b_id): r.n_shared_spans
        for r in shared_span_pairs(docs, n=5).collect()
    }
    # every pair among {1,2,4} shares the 5-gram; doc 3 pairs with none
    assert set(got) == {(1, 2), (1, 4), (2, 4)}
    # the span appears in 3 docs: a doc-frequency cap of 2 drops it
    assert shared_span_pairs(docs, n=5, max_doc_freq=2).count() == 0
