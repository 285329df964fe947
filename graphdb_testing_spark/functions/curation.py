"""Training-data curation operators over the ``documents`` table:
benchmark decontamination, deterministic stratified sampling,
context-window chunking, and repetition scoring.

These are the corpus-hygiene steps a large-scale LLM training-data
pipeline runs after dedup (``functions/dedup.py``) and quality
scoring (``functions/textstats.py``).  All of them are pure JVM-side
column arithmetic — token n-grams via ``split`` + higher-order
``transform``/``slice``, sampling via a portable md5-prefix hash —
so every operator has an exact DuckDB oracle and no Python UDFs.

Scale design (100 TB corpus, 1000 executors):

* Decontamination shuffles only the *n-gram digest* relation (one
  64-bit-ish md5 prefix per gram), never document text; the benchmark
  side is tiny (an eval suite is MBs, not TBs) and is broadcast.
* Sampling is stateless per row — no shuffle at all, and the decision
  is a pure function of (salt, doc_id), so re-runs and retries pick
  identical rows (idempotent under task replay, the property
  ``sample()``/``rand()`` does NOT give under AQE re-execution).
* Chunking fans out rows but never shuffles; downstream writers see
  deterministic ``(doc_id, chunk_id)`` keys for exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# word n-grams as a column expression (shared by decontaminate / repetition)
# ---------------------------------------------------------------------------


def word_ngrams(text_col: str, n: int) -> Column:
    """Array of space-joined word ``n``-grams of ``split(text, ' ')``.

    Higher-order-function form (``transform`` over ``sequence``) —
    stays inside whole-stage codegen, no UDF.  Documents shorter than
    ``n`` words yield an empty array.
    """
    w = f"split({text_col}, ' ')"
    return F.expr(
        f"CASE WHEN size({w}) >= {n} THEN "
        f"transform(sequence(1, size({w}) - {n - 1}), "
        f"i -> array_join(slice({w}, i, {n}), ' ')) "
        f"ELSE array() END"
    )


from ..hashutil import hash_prefix as _hash_prefix


def _hash32(col: Column) -> Column:
    """Portable 32-bit selection hash (see :mod:`hashutil`)."""
    return _hash_prefix(col, 8)


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, n_shared_grams, contaminated)`` per *training* doc.

    A training document is contaminated when it shares at least one
    word ``n``-gram with any benchmark document — the standard
    n-gram-overlap decontamination rule used before pretraining so the
    model is not evaluated on memorized eval data.

    Scale shape: both sides are reduced to ``DISTINCT (doc_id,
    gram_hash)`` digests before the join, so shuffle volume is one
    long per gram, independent of document size.  The benchmark digest
    (an eval suite — small by construction) is broadcast; the join is
    a broadcast semi-probe followed by a count per training doc, i.e.
    one map-side-combined aggregation over the training corpus and NO
    all-to-all shuffle of text.

    The digest is the 60-bit identity hash (15 md5 hex chars): at a
    32-bit width a ~10M-gram eval suite would falsely contaminate a
    clean 1000-gram document with probability ≈ 90% (birthday math);
    at 60 bits the false-hit odds are ~1e-5 per corpus.
    """
    tg = train.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(text_col, n)).alias("gram"),
    ).select("doc_id", _hash_prefix(F.col("gram"), 15).alias("gh")).distinct()
    bg = (
        benchmark.select(F.explode(word_ngrams(text_col, n)).alias("gram"))
        .select(_hash_prefix(F.col("gram"), 15).alias("gh"))
        .distinct()
    )
    hits = (
        tg.join(F.broadcast(bg), "gh")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_shared_grams"))
    )
    return (
        train.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
            # 0/1 flag, not boolean: driver value-hash normalization of
            # booleans across engines is unverified; integers are safe
            (F.coalesce("n_shared_grams", F.lit(0)) > 0)
            .cast("long")
            .alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic stratified sampling
# ---------------------------------------------------------------------------


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff
    ``hash32(salt|doc_id) < rate(stratum) * 2^32``.

    Unlike ``DataFrame.sample`` the decision is a pure function of
    ``(salt, doc_id)`` — stable across retries, AQE re-execution, and
    cluster size, and *nested*: the ``rate=0.25`` sample is an exact
    subset of the ``rate=0.5`` sample with the same salt, which is how
    corpus ablations stay comparable.  No shuffle: a scan-time filter.
    """
    rate = F.lit(default_rate)
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(rate)
    h = _hash32(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
    return docs.withColumn("_rate", rate).filter(
        h < (F.col("_rate") * F.lit(float(2**32))).cast("long")
    ).drop("_rate")


# ---------------------------------------------------------------------------
# context-window chunking
# ---------------------------------------------------------------------------


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, chunk_id, chunk_text, n_tokens)`` — fixed-size
    sliding word windows (stride ``chunk_tokens - overlap``), the
    standard pre-tokenization chunking for context-window packing and
    RAG indexing.

    The final partial window is kept (a document yields
    ``ceil((n_words - overlap) / stride)`` chunks, min 1) so no text
    is dropped.  Pure fan-out: ``sequence`` + ``transform`` + explode,
    no shuffle; ``(doc_id, chunk_id)`` is a deterministic key.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    w = f"split({text_col}, ' ')"
    starts = (
        f"sequence(1, greatest(1, size({w}) - {overlap}), {stride})"
    )
    chunks = F.expr(
        f"transform({starts}, i -> struct("
        f"cast((i - 1) div {stride} as bigint) as chunk_id, "
        f"array_join(slice({w}, i, {chunk_tokens}), ' ') as chunk_text, "
        f"cast(size(slice({w}, i, {chunk_tokens})) as bigint) as n_tokens))"
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(chunks).alias("c"))
        .select("doc_id", "c.chunk_id", "c.chunk_text", "c.n_tokens")
    )


# ---------------------------------------------------------------------------
# repetition scoring
# ---------------------------------------------------------------------------


def repetition_scores(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, total_ngrams, distinct_ngrams, dup_ngram_ratio)`` —
    the duplicated-n-gram-fraction quality signal (Gopher/MassiveText
    repetition filters): ``1 - distinct/total`` over word ``n``-grams,
    0.0 for documents shorter than ``n`` words.

    One explode + one map-side-combined aggregate per document; the
    rounded ratio keeps the float comparable across engines.
    """
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(text_col, n)).alias("gram"),
    )
    scored = grams.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("total_ngrams"),
        F.countDistinct("gram").cast("long").alias("distinct_ngrams"),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("total_ngrams", F.lit(0)).alias("total_ngrams"),
            F.coalesce("distinct_ngrams", F.lit(0)).alias("distinct_ngrams"),
            F.round(
                F.when(
                    F.col("total_ngrams").isNull() | (F.col("total_ngrams") == 0), 0.0
                ).otherwise(1 - F.col("distinct_ngrams") / F.col("total_ngrams")),
                6,
            ).alias("dup_ngram_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# composite keep/drop decision
# ---------------------------------------------------------------------------


def curation_decision(
    docs: DataFrame,
    min_chars: int = 100,
    min_distinct_ratio: float = 0.4,
    max_dup_ngram_ratio: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, keep, drop_reasons)`` — the end-of-pipeline corpus
    filter composing the individual signals: exact-duplicate removal
    (keep only each md5 group's min-id canonical), minimum length,
    type/token diversity, and the duplicated-3-gram repetition cap.

    ``drop_reasons`` is the comma-joined, alphabetically-ordered list
    of failed checks (``dup``, ``low_diversity``, ``repetitive``,
    ``short``) — empty string when kept.  Deterministic by
    construction, so filter ablations diff cleanly between runs.

    One narrow shuffle per signal (md5 group, token aggregate, 3-gram
    aggregate), then a single per-doc join — no text is shuffled more
    than once, and every signal is partial-aggregatable.
    """
    from pyspark.sql import Window

    canonical = docs.select(
        F.col(id_col).alias("doc_id"),
        (
            F.col(id_col)
            == F.min(id_col).over(Window.partitionBy(F.md5(F.col(text_col))))
        ).alias("is_canonical"),
        F.length(text_col).cast("long").alias("n_chars"),
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    diversity = toks.groupBy("doc_id").agg(
        (F.countDistinct("tok") / F.count("*")).alias("distinct_ratio")
    )
    rep = repetition_scores(docs, n=3, id_col=id_col, text_col=text_col).select(
        "doc_id", "dup_ngram_ratio"
    )
    flagged = (
        canonical.join(diversity, "doc_id", "left")
        .join(rep, "doc_id", "left")
        .select(
            "doc_id",
            (~F.col("is_canonical")).alias("f_dup"),
            (F.coalesce("distinct_ratio", F.lit(0.0)) < min_distinct_ratio).alias(
                "f_low_diversity"
            ),
            (F.coalesce("dup_ngram_ratio", F.lit(0.0)) > max_dup_ngram_ratio).alias(
                "f_repetitive"
            ),
            (F.col("n_chars") < min_chars).alias("f_short"),
        )
    )
    reasons = F.concat_ws(
        ",",
        F.filter(
            F.array(
                F.when(F.col("f_dup"), "dup"),
                F.when(F.col("f_low_diversity"), "low_diversity"),
                F.when(F.col("f_repetitive"), "repetitive"),
                F.when(F.col("f_short"), "short"),
            ),
            lambda x: x.isNotNull(),
        ),
    )
    return flagged.select(
        "doc_id",
        (
            ~(
                F.col("f_dup")
                | F.col("f_low_diversity")
                | F.col("f_repetitive")
                | F.col("f_short")
            )
        ).cast("long").alias("keep"),
        reasons.alias("drop_reasons"),
    )


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def pack_sequences(
    docs: DataFrame,
    capacity: int = 64,
    num_buckets: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack-v1",
) -> DataFrame:
    """``(bucket, doc_id, n_tokens, bin_no)`` — greedy sequential
    packing of documents into fixed-capacity token bins (context-window
    packing for pretraining batches): within each bucket, documents are
    taken in ``doc_id`` order and a new bin starts when the current one
    cannot fit the next document.  A document longer than ``capacity``
    occupies a bin alone.

    Packing is inherently sequential (each decision depends on the
    running fill), so it cannot be a window expression; instead the
    corpus is split into ``num_buckets`` independent hash buckets and
    each bucket packs in parallel via Arrow-batched ``applyInPandas``
    — the documented pattern for per-group imperative logic.  Bucket
    count scales with the cluster; determinism comes from the portable
    hash bucket + total ``doc_id`` order within the bucket.
    """
    with_meta = docs.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(
            _hash32(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))),
            F.lit(num_buckets),
        ).alias("bucket"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )

    def pack(pdf):
        pdf = pdf.sort_values("doc_id", ignore_index=True)
        bin_nos = []
        bin_no, fill = 0, 0
        first = True
        for t in pdf["n_tokens"]:
            t = int(t)
            if not first and fill + t > capacity:
                bin_no += 1
                fill = 0
            bin_nos.append(bin_no)
            fill += t
            first = False
        pdf["bin_no"] = bin_nos
        return pdf[["bucket", "doc_id", "n_tokens", "bin_no"]]

    return with_meta.groupBy("bucket").applyInPandas(
        pack, "bucket long, doc_id long, n_tokens long, bin_no long"
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

#: deliberately simple patterns that parse identically under Java
#: regex (Spark) and RE2 (DuckDB): no lookarounds, no backrefs
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def scrub_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, n_email, n_phone, n_ipv4, clean_fingerprint)`` — the
    C4/CCNet-style PII redaction step: count and replace emails,
    phone numbers, and IPv4 literals with ``[TYPE]`` placeholders.
    ``clean_fingerprint`` is the md5 of the scrubbed text, so the
    oracle verifies the REPLACEMENT byte-for-byte, not just counts.

    Pure JVM regex in the scan projection; patterns restricted to the
    Java∩RE2 common dialect so both engines match identically.
    """
    clean = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS.items():
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        clean = F.regexp_replace(clean, pat, f"[{name.upper()}]")
    return docs.select(
        F.col(id_col).alias("doc_id"), *counts, F.md5(clean).alias("clean_fingerprint")
    )


def boilerplate_stats(
    docs: DataFrame,
    n: int = 5,
    min_df: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, total_grams, boiler_grams, boiler_ratio_milli)`` —
    cross-document boilerplate detection (the C4/RefinedWeb repeated-
    line filter re-expressed for line-less corpora): a word ``n``-gram
    is *boilerplate* when its document frequency reaches ``min_df``;
    each doc reports how much of its text such grams cover.

    Scale shape: one explode + two hash-partitioned aggregations.  The
    boilerplate gram list is df-bounded (≤ corpus_grams / min_df rows)
    and joins back via semi-join on the 60-bit gram digest — never a
    text-payload shuffle.  ``boiler_ratio_milli`` is an exact integer
    (``1000·k//total``), so the oracle comparison is float-free.
    """
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(text_col, n)).alias("gram"),
    ).select("doc_id", _hash_prefix(F.col("gram"), 15).alias("gh"))
    df_counts = grams.distinct().groupBy("gh").agg(
        F.countDistinct("doc_id").alias("df")
    )
    boiler = df_counts.filter(F.col("df") >= min_df).select("gh")
    per_doc = grams.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("total_grams")
    )
    boiler_hits = (
        grams.join(boiler, "gh", "semi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("boiler_grams"))
    )
    return (
        per_doc.join(boiler_hits, "doc_id", "left")
        .select(
            "doc_id",
            "total_grams",
            F.coalesce("boiler_grams", F.lit(0)).cast("long").alias("boiler_grams"),
        )
        # integer floor-div keeps the ratio float-free on both engines
        .withColumn(
            "boiler_ratio_milli",
            F.expr("(1000 * boiler_grams) div total_grams").cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (hashed-ngram log-ratio vs a target corpus)
# ---------------------------------------------------------------------------


def dsir_logratios(
    train: DataFrame,
    target: DataFrame,
    n_buckets: int = 8192,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, n_feats, dsir_micro)`` — Data Selection via
    Importance Resampling weights (Xie et al., NeurIPS 2023): score
    every *train* document by how much its hashed-n-gram profile looks
    like the *target* corpus.

    Features are word unigrams + bigrams hashed into ``n_buckets``
    (collisions are part of the method — the hash IS the feature
    map).  Both corpora fit an add-one-smoothed multinomial over the
    buckets; a document's weight is the sum over its feature
    occurrences of ``ln(p_target(b) / p_raw(b))``.  Documents with
    high ``dsir_micro`` resemble the target distribution; resampling
    is then a threshold or :func:`stratified_sample` away.

    Cross-engine float + overflow discipline: each bucket's weight is
    the sum of TWO ``ln``s of exact-integer ratios — the per-bucket
    count ratio ``(ct+1)/(cr+1)`` and the constant total ratio
    ``(n_raw+B)/(n_tgt+B)`` — quantized to integer micros and summed
    exactly (the bigram-LM pattern), so the Spark and DuckDB sides
    agree bit-for-bit.  No integer *products* anywhere: every ``ln``
    operand is a single long→double conversion (exact while each
    count < 2^53 ≈ 9e15 feature occurrences, comfortably past 100 TB)
    followed by one correctly-rounded IEEE division, unlike the naive
    ``(ct+1)*(n_raw+B)`` cross-product whose int64 silently wraps
    once hot-bucket-count × stream-total exceeds 2^63.

    Scale shape: feature fan-out is array-side (no self-join); the
    model is two map-side-combined bucket aggregates whose results are
    ≤ ``n_buckets`` rows — small enough to collect once, which yields
    the stream totals as ``sum(cr)``/``sum(ct)`` for free (no separate
    ``count()`` pass) and lets the broadcast weight table be built
    without re-scanning the corpus.  Each corpus is therefore touched
    exactly twice: once for the model fit, once for the final
    weight-join aggregate.
    """

    def feats(df: DataFrame) -> DataFrame:
        a = df.select(
            F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("a")
        )
        uni = a.select("doc_id", F.explode("a").alias("gram"))
        bi = a.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(a, 1, size(a) - 1),"
                    " (w, i) -> concat(w, ' ', a[i + 1]))"
                )
            ).alias("gram"),
        )
        return uni.unionByName(bi).select(
            "doc_id",
            F.pmod(
                _hash32(F.concat_ws("|", F.lit("dsir"), F.col("gram"))),
                F.lit(n_buckets),
            ).alias("b"),
        )

    spark = train.sparkSession
    raw = feats(train)
    tgt = feats(target)
    # model fit: ONE pass over each feature stream; the bucket table is
    # <= n_buckets rows, so collecting it is bounded, the stream totals
    # fall out as sum(cr)/sum(ct) (no separate count() pass), and the
    # weight table below is built from local rows — the final join is
    # the only other scan of the corpus
    cr_agg = raw.groupBy("b").agg(F.count("*").alias("cr"))
    ct_agg = tgt.groupBy("b").agg(F.count("*").alias("ct"))
    cr_rows = cr_agg.collect()
    ct_rows = ct_agg.collect()
    n_raw = sum(r["cr"] for r in cr_rows)
    n_tgt = sum(r["ct"] for r in ct_rows)
    cr = spark.createDataFrame(cr_rows, cr_agg.schema)
    ct = spark.createDataFrame(ct_rows, ct_agg.schema)
    # two lns of exact-long ratios per bucket, micro-quantized: every
    # operand is one long->double conversion (exact below 2^53) and one
    # IEEE division — no int64 product that could wrap at scale
    lp = cr.join(ct, "b", "left").select(
        "b",
        F.round(
            F.lit(1_000_000.0)
            * (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1)
                    * F.lit(1.0)
                    / (F.col("cr") + 1)
                )
                + F.log(
                    F.lit(float(n_raw + n_buckets) / float(n_tgt + n_buckets))
                )
            )
        )
        .cast("long")
        .alias("lp"),
    )
    return (
        raw.join(F.broadcast(lp), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.sum("lp").cast("long").alias("dsir_micro"),
        )
    )


def gumbel_topk_sample(
    scored: DataFrame,
    k: int,
    weight_col: str = "w",
    tau: float = 1.0,
    salt: str = "gumbel-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id_col, weight_col, gkey_micro)`` — deterministic weighted
    sampling WITHOUT replacement: the top ``k`` rows by
    Gumbel-perturbed weight.  This is the *resampling* half of DSIR
    (Xie et al., NeurIPS 2023 — :func:`dsir_logratios` computes the
    log-ratio weights; this draws the sample): by the Gumbel-max
    trick, ``argtop_k(w/τ + G_i)`` with i.i.d. standard Gumbel noise
    ``G_i`` is an exact sample from ``softmax(w/τ)`` without
    replacement (Vieira 2014; Kool et al., ICML 2019 stochastic
    beams).  ``τ`` sharpens (``τ→0`` = plain top-k) or flattens
    (``τ→∞`` = uniform) the draw.

    The noise is *pseudorandom but portable*: ``u = (h + 0.5) / 2^32``
    from the md5-prefix hash of ``salt|id`` (the
    :func:`stratified_sample` contract — identical under task retry,
    AQE re-execution, and cluster resizing, which ``rand()`` is NOT),
    and ``G = -ln(-ln(u))``.  Same draw on any engine, so the DuckDB
    oracle reproduces the exact sample.

    Scale shape: one stateless projection (hash + two ``ln``s per
    row), then a global top-k — ``TakeOrderedAndProject``, the
    per-partition-heap + k-row-merge physical form, never a global
    sort.  ``k`` rows cross the network; everything else stays put.
    """
    u = (
        _hash32(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    gkey = F.col(weight_col) / F.lit(float(tau)) - F.log(-F.log(u))
    return (
        scored.withColumn("_gkey", gkey)
        .orderBy(F.desc("_gkey"), id_col)
        .limit(k)
        .select(
            id_col,
            weight_col,
            F.round(F.lit(1_000_000.0) * F.col("_gkey"))
            .cast("long")
            .alias("gkey_micro"),
        )
    )


# ---------------------------------------------------------------------------
# UniMax language-budget allocation (epoch-capped waterfill)
# ---------------------------------------------------------------------------


def unimax_budgets(
    docs: DataFrame,
    total_budget: int,
    max_epochs: int = 4,
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """``(lang, n_tokens, cap, budget_tokens, epochs_milli)`` — UniMax
    mixture allocation (Chung et al., ICLR 2023): distribute a total
    token budget uniformly across languages, capping each language at
    ``max_epochs`` passes over its data and re-distributing the
    unused share to the rest — the waterfill that avoids both
    proportional sampling's head-language dominance and uniform
    sampling's tail-language over-epoching.

    Closed form instead of the paper's loop: with languages sorted by
    capacity ascending, the capped set is exactly the prefix where
    ``cap_i * (n - i + 1) <= T - prefix_cap_sum_i`` (ascending caps
    make the condition monotone), and every uncapped language gets the
    equal integer share of what the capped prefix left behind, with
    the division remainder assigned to the first ``rem % u`` uncapped
    languages in sort order.  Everything is exact BIGINT arithmetic —
    no floats to disagree across engines.

    Scale shape: one map-side-combined token-count aggregate over the
    corpus; everything after is on the ≤ |languages| row table (the
    unpartitioned windows are bounded by construction).
    """
    caps = docs.groupBy(F.col(strata_col).alias("lang")).agg(
        F.sum(F.size(F.split(F.col(text_col), " "))).cast("long").alias("n_tokens")
    ).withColumn("cap", F.col("n_tokens") * max_epochs)
    w = Window.orderBy("cap", "lang")
    ranked = (
        caps.withColumn("i", F.row_number().over(w))
        .withColumn(
            "prevsum",
            F.coalesce(
                F.sum("cap").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn("n", F.count("*").over(Window.partitionBy()))
        .withColumn(
            "capped",
            (
                F.col("cap") * (F.col("n") - F.col("i") + 1)
                <= F.lit(total_budget) - F.col("prevsum")
            ).cast("long"),
        )
    )
    scal = ranked.agg(
        F.coalesce(
            F.sum(F.when(F.col("capped") == 1, F.col("cap"))), F.lit(0)
        ).alias("c"),
        F.sum(F.when(F.col("capped") == 0, F.lit(1)).otherwise(F.lit(0))).alias("u"),
    )
    out = ranked.crossJoin(F.broadcast(scal)).withColumn(
        "budget_tokens",
        F.when(F.col("capped") == 1, F.col("cap")).otherwise(
            F.expr(f"({total_budget} - c) div u")
            + F.when(
                (F.col("i") - (F.col("n") - F.col("u")))
                <= F.expr(f"({total_budget} - c) % u"),
                F.lit(1),
            ).otherwise(F.lit(0))
        ),
    )
    return out.select(
        "lang",
        "n_tokens",
        "cap",
        F.col("budget_tokens").cast("long").alias("budget_tokens"),
        F.expr("(1000 * budget_tokens) div n_tokens").cast("long").alias("epochs_milli"),
    )


# ---------------------------------------------------------------------------
# token-balanced shard planning (training ingestion layout)
# ---------------------------------------------------------------------------


def shard_plan_balanced(
    docs: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shard-v1",
) -> DataFrame:
    """``(doc_id, n_tokens, shard, pos)`` — assign every document to
    one of ``n_shards`` output shards so the per-shard token totals
    are balanced, and give it a deterministic pseudorandom position
    within its shard: the final "write the corpus as N shuffled,
    size-balanced files" step of a training-data pipeline (readers
    stream shards independently, so skewed shards become straggler
    ingestion workers).

    Balance is boustrophedon (snake) round-robin over the global
    token-count ranking: rank documents by ``n_tokens`` descending
    (ties by id), deal rank ``r`` to shard ``r % N`` on even passes
    and ``N-1-r % N`` on odd ones — the max/min shard-total gap is
    bounded by one document's tokens, no iterative bin-packing
    needed.  Within a shard, ``pos`` orders documents by the portable
    ``md5(salt|doc_id)`` hash — a deterministic shuffle that is
    stable across retries and cluster sizes (same contract as
    :func:`stratified_sample`).

    Scale shape: the global ranking is
    :func:`~graphdb_testing_spark.operators.prefix.range_row_number`
    — one range shuffle plus parallel per-partition local ranks with
    broadcast rank bases, never a single-task ``Window.orderBy`` over
    the corpus (plan-asserted in ``tests/test_prefix_scale.py``).
    The within-shard position window partitions by shard — N
    independent sorts of ~|corpus|/N rows each, so **size n_shards to
    the data**: each shard must fit a single task's sort budget
    (hundreds of MBs of ``(doc_id, hash)`` pairs per shard, i.e.
    n_shards ≳ corpus_rows / 10M), which any real training layout
    already satisfies (thousands of shards at 100 TB).  Pair with
    ``df.write.partitionBy("shard")`` to lay the files out.
    """
    from ..operators.prefix import range_row_number

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    ranked = range_row_number(
        toks, [F.desc("n_tokens"), F.col("doc_id")], "r"
    ).withColumn("r", F.col("r") - 1)
    shard = F.when(
        F.expr(f"(r div {n_shards}) % 2 = 0"), F.col("r") % n_shards
    ).otherwise(F.lit(n_shards - 1) - F.col("r") % n_shards)
    planned = ranked.withColumn("shard", shard.cast("long"))
    wp = Window.partitionBy("shard").orderBy(
        _hash32(F.concat(F.lit(salt + "|"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return planned.select(
        "doc_id",
        "n_tokens",
        "shard",
        (F.row_number().over(wp)).cast("long").alias("pos"),
    )


def ccnet_perplexity_buckets(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style per-language perplexity buckets — ``(doc_id, lang,
    avg_logp_micro, ppl_bucket, bucket_label)`` for every document
    with at least one bigram.

    CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality
    Monolingual Datasets from Web Crawl Data") splits each language's
    documents into head/middle/tail terciles by language-model
    perplexity and trains preferentially on the head.  Here the LM is
    the registry's corpus-trained add-one bigram model
    (:func:`~graphdb_testing_spark.functions.textstats.
    bigram_lm_scores`, exact integer micros), the per-document score
    is the length-normalized ``avg_logp_micro`` (higher = more
    fluent), and bucket 1 = head (lowest perplexity).

    Scale shape: the within-language ranking NEVER plans a
    per-language window (|languages| partitions each holding n/|L|
    rows — the skew the exact-rank helpers exist to avoid).  Instead
    one global ``range_row_number`` over ``(lang, ppl, doc_id)``
    range-shuffles the corpus once; per-language rank = global rank −
    the language's broadcast first-rank base, and the bucket is the
    closed-form ntile over (within-rank, language count) — standard
    SQL NTILE semantics, bit-identical to the oracle's windowed
    NTILE.
    """
    from ..operators.prefix import ntile_expr, range_row_number
    from .textstats import bigram_lm_scores

    if k < 2:
        # head/tail/middle labels presume distinct first and last
        # buckets (CCNet's own split is head/middle/tail, k=3); with
        # k=1 the single bucket would read "head", and the registered
        # oracle's CASE shares the same k — guard rather than drift
        raise ValueError(f"ccnet_perplexity_buckets requires k >= 2, got {k}")
    lm = bigram_lm_scores(docs, id_col, text_col)
    scored = (
        lm.filter(F.col("n_bigrams") > 0)
        .select(
            "doc_id",
            F.expr("sum_logp_micro div n_bigrams").cast("long").alias("avg_logp_micro"),
        )
        .join(
            docs.select(F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang")),
            "doc_id",
        )
        .withColumn("_ppl", -F.col("avg_logp_micro"))
    )
    ranked = range_row_number(
        scored, [F.col("lang"), F.col("_ppl"), F.col("doc_id")], "_gr"
    )
    langn = ranked.groupBy("lang").agg(
        F.count("*").cast("long").alias("_n"), F.min("_gr").alias("_first")
    )
    within = F.col("_gr") - F.col("_first") + F.lit(1)
    bucket = ntile_expr(within, F.col("_n"), k).cast("long")
    label = (
        F.when(F.col("ppl_bucket") == 1, F.lit("head"))
        .when(F.col("ppl_bucket") == k, F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    return (
        ranked.join(F.broadcast(langn), "lang")
        .withColumn("ppl_bucket", bucket)
        .select("doc_id", "lang", "avg_logp_micro", "ppl_bucket", label.alias("bucket_label"))
    )


def sequence_packing_plan(
    docs: DataFrame,
    capacity: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence-packing plan — ``(doc_id, n_tokens,
    start_off, first_chunk, last_chunk, n_chunks, spans_boundary)``.

    LLM pretraining pipelines pack documents by CONCATENATING the
    token stream in a fixed order and slicing it at ``capacity``
    boundaries (the T5/GPT packing recipe); this emits, per document,
    exactly where its tokens land: the exclusive global token offset,
    the first/last training chunk touched, and whether the document
    straddles a chunk boundary (the fraction of straddlers is the
    attention-contamination metric a packing config is judged by).
    Tokens are whitespace words (the registry's word-count model);
    order is ``doc_id`` ascending — deterministic and total.

    Scale shape: the only global coordination is
    :func:`~graphdb_testing_spark.operators.prefix.range_prefix_sum`
    — one range shuffle plus a broadcast of per-partition bases —
    never a single-partition window over the corpus (the plan shape
    that dies first at 100 TB: SUM() OVER (ORDER BY ...) with no
    PARTITION BY).  Everything after the offset is map-side integer
    arithmetic.
    """
    from ..operators.prefix import range_prefix_sum

    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    words = F.expr(f"size(filter(split({text_col}, ' '), t -> t <> ''))")
    per_doc = docs.select(
        F.col(id_col).alias("doc_id"), words.cast("long").alias("n_tokens")
    )
    off = range_prefix_sum(per_doc, "doc_id", "n_tokens", "start_off")
    first = F.expr(f"start_off div {capacity}")
    # an empty doc occupies no tokens: pin it to its offset's chunk
    last = F.when(
        F.col("n_tokens") > 0,
        F.expr(f"(start_off + n_tokens - 1) div {capacity}"),
    ).otherwise(first)
    return off.select(
        "doc_id",
        "n_tokens",
        "start_off",
        first.cast("long").alias("first_chunk"),
        last.cast("long").alias("last_chunk"),
        (last - first + 1).cast("long").alias("n_chunks"),
        (last > first).cast("long").alias("spans_boundary"),
    )
