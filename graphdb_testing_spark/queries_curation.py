"""Corpus-curation queries (decontamination / sampling / chunking /
repetition) + DuckDB oracles.

Lockstep idioms with the oracle: Spark ``slice(w, i, n)`` ≡ DuckDB
``w[i:i+n-1]`` (both 1-based, both clamp past the end); Spark
``sequence(1, stop, step)`` ≡ DuckDB ``generate_series(1, stop,
step)`` (both stop-inclusive); the portable 32-bit hash is
``conv(substr(md5(x),1,8),16,10)`` ≡ ``('0x' ||
substr(md5(x),1,8))::BIGINT``.  Sampling rates are dyadic (0.5, 0.25,
0.125) so ``rate * 2^32`` is exact in float64 and the FLOOR on both
sides agrees bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import datasets
from .functions import curation
from .queries import register

# ---------------------------------------------------------------------------
# benchmark decontamination (train = source<>'src0', benchmark = 'src0')
# ---------------------------------------------------------------------------

_GRAMS_CTE = """
words AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT doc_id, source, array_to_string(w[i:i+{hi}], ' ') AS gram
  FROM words, UNNEST(generate_series(1, len(w) - {hi})) AS t(i)
  WHERE len(w) >= {n}
)
"""

_DECONTAM_ORACLE = (
    "WITH "
    + _GRAMS_CTE.format(n=8, hi=7)
    + """,
tg AS (SELECT DISTINCT doc_id, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh
       FROM grams WHERE source <> 'src0'),
bg AS (SELECT DISTINCT ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh
       FROM grams WHERE source = 'src0'),
hits AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
         FROM tg JOIN bg USING (gh) GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(h.n_shared_grams, 0) AS n_shared_grams,
       CAST(COALESCE(h.n_shared_grams, 0) > 0 AS BIGINT) AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.source <> 'src0'
"""
)


@register("decontamination", _DECONTAM_ORACLE)
def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = datasets.load_table(spark, sf_dir, "documents")
    return curation.decontaminate(
        docs.filter(docs.source != "src0"),
        docs.filter(docs.source == "src0"),
        n=8,
    )


# ---------------------------------------------------------------------------
# deterministic stratified sampling (dyadic rates — exact both engines)
# ---------------------------------------------------------------------------

_SAMPLE_ORACLE = """
SELECT doc_id, lang FROM documents
WHERE ('0x' || substr(md5('sample-v1|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      < CAST(FLOOR((CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.25
                    ELSE 0.125 END) * 4294967296.0) AS BIGINT)
"""


@register("stratified_sample", _SAMPLE_ORACLE)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = datasets.load_table(spark, sf_dir, "documents")
    return curation.stratified_sample(
        docs, rates={"en": 0.5, "zh": 0.25}, default_rate=0.125
    ).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# context-window chunking (chunk 16 words, overlap 4 → stride 12)
# ---------------------------------------------------------------------------

_CHUNKS_ORACLE = """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       CAST((i - 1) // 12 AS BIGINT) AS chunk_id,
       array_to_string(w[i:i+15], ' ') AS chunk_text,
       CAST(len(w[i:i+15]) AS BIGINT) AS n_tokens
FROM words, UNNEST(generate_series(1, greatest(1, len(w) - 4), 12)) AS t(i)
"""


@register("document_chunks", _CHUNKS_ORACLE)
def q_document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = datasets.load_table(spark, sf_dir, "documents")
    return curation.chunk_documents(docs, chunk_tokens=16, overlap=4)


# ---------------------------------------------------------------------------
# repetition scoring (duplicated 3-gram fraction)
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = (
    "WITH "
    + _GRAMS_CTE.format(n=3, hi=2)
    + """,
s AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS total_ngrams,
             CAST(COUNT(DISTINCT gram) AS BIGINT) AS distinct_ngrams
      FROM grams GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(s.total_ngrams, 0) AS total_ngrams,
       COALESCE(s.distinct_ngrams, 0) AS distinct_ngrams,
       ROUND(CASE WHEN COALESCE(s.total_ngrams, 0) = 0 THEN 0.0
             ELSE 1 - s.distinct_ngrams / CAST(s.total_ngrams AS DOUBLE)
             END, 6) AS dup_ngram_ratio
FROM documents d LEFT JOIN s USING (doc_id)
"""
)


@register("repetition_scores", _REPETITION_ORACLE)
def q_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = datasets.load_table(spark, sf_dir, "documents")
    return curation.repetition_scores(docs, n=3)


# ---------------------------------------------------------------------------
# composite keep/drop decision (dup + length + diversity + repetition)
# ---------------------------------------------------------------------------

_DECISION_ORACLE = (
    "WITH "
    + _GRAMS_CTE.format(n=3, hi=2)
    + """,
canon AS (
  SELECT doc_id,
         doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical,
         CAST(LEN(text) AS BIGINT) AS n_chars
  FROM documents
),
toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
  ) WHERE tok <> ''
),
div AS (
  SELECT doc_id, COUNT(DISTINCT tok) / (1e0 * COUNT(*)) AS distinct_ratio
  FROM toks GROUP BY doc_id
),
rep AS (
  SELECT doc_id,
         ROUND(1 - COUNT(DISTINCT gram) / CAST(COUNT(*) AS DOUBLE), 6)
           AS dup_ngram_ratio
  FROM grams GROUP BY doc_id
),
flags AS (
  SELECT c.doc_id,
         NOT c.is_canonical AS f_dup,
         COALESCE(d.distinct_ratio, 0e0) < 0.4e0 AS f_low_diversity,
         COALESCE(r.dup_ngram_ratio, 0e0) > 0.3e0 AS f_repetitive,
         c.n_chars < 100 AS f_short
  FROM canon c LEFT JOIN div d USING (doc_id) LEFT JOIN rep r USING (doc_id)
)
SELECT doc_id,
       CAST(NOT (f_dup OR f_low_diversity OR f_repetitive OR f_short) AS BIGINT) AS keep,
       concat_ws(',',
         CASE WHEN f_dup THEN 'dup' END,
         CASE WHEN f_low_diversity THEN 'low_diversity' END,
         CASE WHEN f_repetitive THEN 'repetitive' END,
         CASE WHEN f_short THEN 'short' END) AS drop_reasons
FROM flags
"""
)


@register("curation_decision", _DECISION_ORACLE)
def q_curation_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = datasets.load_table(spark, sf_dir, "documents")
    return curation.curation_decision(docs)


# ---------------------------------------------------------------------------
# sequence packing (greedy per-bucket bin packing, recursive-CTE oracle)
# ---------------------------------------------------------------------------

_PACK_CAPACITY = 64
_PACK_BUCKETS = 8

_PACK_ORACLE = f"""
WITH RECURSIVE meta AS (
  SELECT doc_id,
         ('0x' || substr(md5('pack-v1|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % {_PACK_BUCKETS} AS bucket,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
ordered AS (
  SELECT bucket, doc_id, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
  FROM meta
),
pack AS (
  SELECT bucket, rn, doc_id, n_tokens,
         CAST(0 AS BIGINT) AS bin_no, n_tokens AS fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT d.bucket, d.rn, d.doc_id, d.n_tokens,
         CASE WHEN p.fill + d.n_tokens > {_PACK_CAPACITY}
              THEN p.bin_no + 1 ELSE p.bin_no END,
         CASE WHEN p.fill + d.n_tokens > {_PACK_CAPACITY}
              THEN d.n_tokens ELSE p.fill + d.n_tokens END
  FROM pack p JOIN ordered d ON d.bucket = p.bucket AND d.rn = p.rn + 1
)
SELECT bucket, doc_id, n_tokens, bin_no FROM pack
"""


@register("sequence_packing", _PACK_ORACLE)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = datasets.load_table(spark, sf_dir, "documents")
    return curation.pack_sequences(
        docs, capacity=_PACK_CAPACITY, num_buckets=_PACK_BUCKETS
    )


# ---------------------------------------------------------------------------
# quality deciles (ntile over the heuristic quality score)
# ---------------------------------------------------------------------------

from .queries_graphops import _QUALITY_ORACLE  # noqa: E402

_DECILES_ORACLE = f"""
WITH q AS ({_QUALITY_ORACLE}),
d AS (
  SELECT doc_id, quality,
         NTILE(10) OVER (ORDER BY quality, doc_id) AS decile
  FROM q
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(MIN(quality), 6) AS min_q,
       ROUND(MAX(quality), 6) AS max_q
FROM d GROUP BY decile
"""


@register("quality_deciles", _DECILES_ORACLE)
def q_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile summary of the heuristic quality distribution (exact
    NTILE semantics over a deterministic (quality, doc_id) order) —
    the bucketing a curriculum / data-mixing stage consumes.

    Scale shape: :func:`operators.prefix.range_ntile` (range shuffle +
    parallel local ranks + closed-form ntile) — the single-task
    ``ntile().over(Window.orderBy(...))`` global sort never happens,
    so the EXACT deciles themselves are now the scale path
    (approx_percentile remains the cheaper-still alternative when
    epsilon error is acceptable)."""
    from .functions import textstats
    from .operators.prefix import range_ntile

    docs = datasets.load_table(spark, sf_dir, "documents")
    q = textstats.quality_score(docs)
    d = range_ntile(
        q, [F.col("quality"), F.col("doc_id")], 10, "decile"
    )
    return d.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.min("quality"), 6).alias("min_q"),
        F.round(F.max("quality"), 6).alias("max_q"),
    )


# ---------------------------------------------------------------------------
# end-to-end corpus-prep pipeline: curate -> decontaminate -> sample -> chunk
# ---------------------------------------------------------------------------

_PIPELINE_ORACLE = (
    "WITH "
    + _GRAMS_CTE.format(n=3, hi=2)
    + """,
g8 AS (
  SELECT doc_id, source, array_to_string(w[i:i+7], ' ') AS gram
  FROM words, UNNEST(generate_series(1, len(w) - 7)) AS t(i)
  WHERE len(w) >= 8
),
canon AS (
  SELECT doc_id,
         doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical,
         CAST(LEN(text) AS BIGINT) AS n_chars
  FROM documents
),
toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
  ) WHERE tok <> ''
),
div AS (
  SELECT doc_id, COUNT(DISTINCT tok) / (1e0 * COUNT(*)) AS distinct_ratio
  FROM toks GROUP BY doc_id
),
rep AS (
  SELECT doc_id,
         ROUND(1 - COUNT(DISTINCT gram) / CAST(COUNT(*) AS DOUBLE), 6)
           AS dup_ngram_ratio
  FROM grams GROUP BY doc_id
),
kept AS (
  SELECT c.doc_id FROM canon c
  LEFT JOIN div d USING (doc_id) LEFT JOIN rep r USING (doc_id)
  WHERE c.is_canonical
    AND COALESCE(d.distinct_ratio, 0e0) >= 0.4e0
    AND COALESCE(r.dup_ngram_ratio, 0e0) <= 0.3e0
    AND c.n_chars >= 100
),
bench_grams AS (
  SELECT DISTINCT ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh
  FROM g8 WHERE source = 'src0'
),
contaminated AS (
  SELECT DISTINCT t.doc_id
  FROM (SELECT DISTINCT doc_id,
               ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh
        FROM g8 WHERE source <> 'src0') t
  JOIN bench_grams USING (gh)
),
clean AS (
  SELECT d.doc_id, d.lang, d.text FROM documents d
  JOIN kept USING (doc_id)
  WHERE d.source <> 'src0'
    AND NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = d.doc_id)
),
sampled AS (
  SELECT doc_id, text FROM clean
  WHERE ('0x' || substr(md5('sample-v1|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        < CAST(FLOOR((CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.25
                      ELSE 0.125 END) * 4294967296.0) AS BIGINT)
),
sw AS (SELECT doc_id, string_split(text, ' ') AS w FROM sampled)
SELECT doc_id,
       CAST((i - 1) // 12 AS BIGINT) AS chunk_id,
       CAST(len(w[i:i+15]) AS BIGINT) AS n_tokens
FROM sw, UNNEST(generate_series(1, greatest(1, len(w) - 4), 12)) AS t(i)
"""
)


@register("corpus_prep_pipeline", _PIPELINE_ORACLE)
def q_corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole corpus-prep DAG in one plan: composite quality/dedup
    keep-filter -> benchmark decontamination (vs the src0 eval set) ->
    deterministic stratified sampling -> context-window chunking.
    Every stage is the already-oracle-checked operator; this query
    checks their COMPOSITION end-to-end (the training-data pipeline a
    100 TB run executes, at fixture scale).

    Scale note: expressed as ONE lazy plan the corpus parquet is
    scanned once per signal (~16 pruned scans here).  A production
    100 TB run materializes each stage boundary (write kept doc_ids /
    clean corpus back to parquet and continue), trading cheap columnar
    re-scans for one full pass per stage — the standard staged-DAG
    layout; the composition semantics checked here are identical."""
    docs = datasets.load_table(spark, sf_dir, "documents")
    kept = (
        curation.curation_decision(docs)
        .filter(F.col("keep") == 1)
        .select("doc_id")
    )
    train = docs.filter(docs.source != "src0").join(kept, "doc_id", "left_semi")
    bench = docs.filter(docs.source == "src0")
    clean = train.join(
        curation.decontaminate(train, bench, n=8)
        .filter(F.col("contaminated") == 1)
        .select("doc_id"),
        "doc_id",
        "left_anti",
    )
    sampled = curation.stratified_sample(
        clean, rates={"en": 0.5, "zh": 0.25}, default_rate=0.125
    )
    return curation.chunk_documents(sampled, chunk_tokens=16, overlap=4).select(
        "doc_id", "chunk_id", "n_tokens"
    )


# ---------------------------------------------------------------------------
# corpus crosstab with CUBE grouping sets (lang × source, all margins)
# ---------------------------------------------------------------------------


@register(
    "corpus_cube",
    """
SELECT COALESCE(lang, '<all>') AS lang,
       COALESCE(source, '<all>') AS source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY CUBE (lang, source)
""",
)
def q_corpus_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE crosstab of the corpus: doc counts and total chars for
    every (lang, source) combination plus all margins — the mixing
    report a data-composition dashboard reads (GROUPING SETS surface;
    ROLLUP is covered by `events_rollup`)."""
    docs = datasets.load_table(spark, sf_dir, "documents")
    return (
        docs.cube("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .select(
            F.coalesce("lang", F.lit("<all>")).alias("lang"),
            F.coalesce("source", F.lit("<all>")).alias("source"),
            "n_docs",
            "total_chars",
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing (redaction verified by fingerprint)
# ---------------------------------------------------------------------------

_PII_ORACLE = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT)
         AS n_phone,
       CAST(len(regexp_extract_all(text,
         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
         '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IPV4]', 'g'))
         AS clean_fingerprint
FROM documents
"""


@register("pii_scrub", _PII_ORACLE)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction counts + scrubbed-text fingerprint per document
    (`functions/curation.scrub_pii`).  The fixture corpus carries no
    PII (counts are zero and the fingerprint equals the raw text's) —
    the synthetic-PII unit test is the positive-path check; this query
    pins the engine parity of the patterns and the replacement."""
    docs = datasets.load_table(spark, sf_dir, "documents")
    return curation.scrub_pii(docs)


# ---------------------------------------------------------------------------
# cross-document boilerplate detection (repeated-span filter)
# ---------------------------------------------------------------------------

_BOILER_ORACLE = (
    "WITH "
    + _GRAMS_CTE.format(n=2, hi=1)
    + """,
gh AS (SELECT doc_id, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh FROM grams),
boiler AS (
  SELECT gh FROM (SELECT gh, COUNT(DISTINCT doc_id) AS df FROM gh GROUP BY gh)
  WHERE df >= 10
),
per_doc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS total_grams FROM gh GROUP BY doc_id),
hits AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS boiler_grams
  FROM gh SEMI JOIN boiler USING (gh) GROUP BY doc_id
)
SELECT p.doc_id, p.total_grams,
       COALESCE(h.boiler_grams, 0) AS boiler_grams,
       CAST((1000 * COALESCE(h.boiler_grams, 0)) // p.total_grams AS BIGINT)
         AS boiler_ratio_milli
FROM per_doc p LEFT JOIN hits h USING (doc_id)
"""
)


@register("boilerplate_stats", _BOILER_ORACLE)
def q_boilerplate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span (boilerplate) coverage per doc —
    the C4/RefinedWeb repeated-line filter for line-less corpora
    (:func:`functions.curation.boilerplate_stats`).  n=2/min_df=10
    fits the synthetic corpus's gram-frequency profile; production
    corpora use longer grams and a df threshold scaled to corpus
    size.  The boiler list is df-bounded and joins via 60-bit digest
    semi-join — no text payload crosses a shuffle twice."""
    docs = datasets.load_table(spark, sf_dir, "documents")
    return curation.boilerplate_stats(docs, n=2, min_df=10)


# ---------------------------------------------------------------------------
# safety blocklist filtering (token-level hit counts + flag)
# ---------------------------------------------------------------------------

_BLOCKLIST = ("slow", "error", "big")  # stand-in terms; real lists plug in

_BLOCKLIST_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
  ) WHERE tok <> ''
),
hits AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN tok IN {_BLOCKLIST} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits,
         CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM toks GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
       COALESCE(h.n_tokens, 0) AS n_tokens,
       CAST((1000 * COALESCE(h.n_hits, 0)) //
            GREATEST(COALESCE(h.n_tokens, 0), 1) AS BIGINT) AS hit_ratio_milli,
       CAST(COALESCE(h.n_hits, 0) > 0 AS BIGINT) AS flagged
FROM documents d LEFT JOIN hits h USING (doc_id)
"""


@register("blocklist_hits", _BLOCKLIST_ORACLE)
def q_blocklist_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety/blocklist filtering: token-level hit counts, integer
    milli hit-ratio, and a binary flag per document — the keyword
    tier of a content-filter cascade (the regex/classifier tiers
    share this exact plan shape: explode once, aggregate once).  The
    tiny term set compiles to an IN-list predicate; real deployments
    broadcast the list as a join when it outgrows a literal."""
    docs = datasets.load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    hits = toks.groupBy("doc_id").agg(
        F.sum(F.col("tok").isin(*_BLOCKLIST).cast("long")).alias("n_hits"),
        F.count("*").cast("long").alias("n_tokens"),
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.expr(
                "(1000 * coalesce(n_hits, 0)) div greatest(coalesce(n_tokens, 0), 1)"
            )
            .cast("long")
            .alias("hit_ratio_milli"),
            (F.coalesce("n_hits", F.lit(0)) > 0).cast("long").alias("flagged"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic cross-validation folds
# ---------------------------------------------------------------------------

_CV_ORACLE = """
WITH folds AS (
  SELECT doc_id, lang, n_chars,
         ('0x' || substr(md5('cv-v1|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % 5 AS fold
  FROM documents
)
SELECT CAST(fold AS BIGINT) AS fold,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
FROM folds GROUP BY fold
"""


@register("cv_folds", _CV_ORACLE)
def q_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold assignment by the portable hash (stable
    under reruns, task retries, and repartitioning — the property a
    train/validation split MUST have) with per-fold size and language
    balance — the split audit a training pipeline gates on."""
    from .hashutil import hash_mod

    docs = datasets.load_table(spark, sf_dir, "documents")
    folds = docs.withColumn(
        "fold", hash_mod("cv-v1", [F.col("doc_id")], F.lit(5))
    )
    return folds.groupBy(F.col("fold").cast("long").alias("fold")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis A-ES)
# ---------------------------------------------------------------------------

_WEIGHTED_SAMPLE_ORACLE = """
WITH draw AS MATERIALIZED (
  SELECT doc_id, n_chars AS w,
         ('0x' || substr(md5('ws|' || doc_id::VARCHAR), 1, 13))::BIGINT
           / 4503599627370496e0 AS u
  FROM documents WHERE n_chars > 0
),
keyed AS (
  SELECT doc_id, CAST(w AS BIGINT) AS w,
         CAST(ROUND(1e6 * LN(u) / w) AS BIGINT) AS key_micro
  FROM draw
),
ranked AS (
  SELECT doc_id, w, key_micro,
         ROW_NUMBER() OVER (ORDER BY key_micro DESC, doc_id) AS rank
  FROM keyed
)
SELECT doc_id, w, key_micro, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 50
"""


@register("weighted_sample_50", _WEIGHTED_SAMPLE_ORACLE)
def q_weighted_sample_50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, 50 documents with
    probability ∝ ``n_chars`` — Efraimidis–Spirakis A-ES: each row
    draws a deterministic md5 uniform ``u`` and the top-k by
    ``u^(1/w)`` (equivalently ``ln(u)/w``, micro-quantized with
    doc_id tie-break) is the sample.  One scan + one top-k — no
    per-stratum state, no rejection loop — which is why A-ES is *the*
    distributed weighted sampler (each partition keeps a local top-k;
    the merge is an order statistic).  The exp-draw keys are the only
    float (one rounding of one ln, the TF-IDF discipline)."""
    from pyspark.sql import Window

    from .hashutil import hash_prefix

    docs = datasets.load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    u = hash_prefix(
        F.concat_ws("|", F.lit("ws"), F.col("doc_id").cast("string")), 13
    ) / F.lit(float(1 << 52))
    keyed = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("w"),
        F.round(F.lit(1_000_000.0) * F.log(u) / F.col("n_chars"))
        .cast("long")
        .alias("key_micro"),
    )
    # A-ES top-k via orderBy().limit → TakeOrderedAndProject (exactly
    # the per-partition-heap + merge the algorithm calls for); the
    # rank window then covers 50 rows
    top = keyed.orderBy(F.col("key_micro").desc(), F.col("doc_id")).limit(50)
    w = Window.orderBy(F.col("key_micro").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "w", "key_micro", F.col("rank").cast("long").alias("rank")
    )


# ---------------------------------------------------------------------------
# Domain mixing weights (temperature-scaled sampling, alpha = 0.5)
# ---------------------------------------------------------------------------

_MIXING_ORACLE = """
WITH dom AS MATERIALIZED (
  SELECT source, lang, COUNT(*) AS n,
         CAST(ROUND(1e6 * SQRT(COUNT(*))) AS BIGINT) AS sq_micro
  FROM documents GROUP BY source, lang
),
tot AS (
  SELECT SUM(n) AS n_total, SUM(sq_micro) AS sq_total FROM dom
)
SELECT d.source, d.lang, CAST(d.n AS BIGINT) AS n_docs,
       CAST((1000000 * d.n) // t.n_total AS BIGINT) AS actual_micro,
       CAST((1000000 * d.sq_micro) // t.sq_total AS BIGINT) AS target_micro,
       CAST((1000000 * d.sq_micro * t.n_total) // (t.sq_total * d.n) AS BIGINT)
         AS weight_micro
FROM dom d, tot t
"""


@register("domain_mixing_weights", _MIXING_ORACLE)
def q_domain_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing (α = 0.5, the multilingual
    temperature-sampling rule): target share of each (source, lang)
    domain ∝ n^α, so rare domains are up-sampled and head domains
    down-sampled; ``weight_micro`` is the per-document resampling
    weight (target/actual).  Float-free after one sqrt: each domain's
    n^α is micro-quantized to BIGINT, shares are exact integer
    ratios.  One 2-key aggregate + a scalar total — the data-mixing
    spec sheet for a 100 TB corpus in a single pass."""
    docs = datasets.load_table(spark, sf_dir, "documents")
    dom = docs.groupBy("source", "lang").agg(
        F.count("*").alias("n"),
        F.round(F.lit(1_000_000.0) * F.sqrt(F.count("*")))
        .cast("long")
        .alias("sq_micro"),
    )
    tot = dom.agg(
        F.sum("n").alias("n_total"), F.sum("sq_micro").alias("sq_total")
    )
    return dom.crossJoin(F.broadcast(tot)).select(
        "source",
        "lang",
        F.col("n").cast("long").alias("n_docs"),
        F.expr("(1000000 * n) div n_total").cast("long").alias("actual_micro"),
        F.expr("(1000000 * sq_micro) div sq_total").cast("long").alias("target_micro"),
        F.expr("(1000000 * sq_micro * n_total) div (sq_total * n)")
        .cast("long")
        .alias("weight_micro"),
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage / OOV audit (top-1000 vocab)
# ---------------------------------------------------------------------------

_VOCAB_OOV_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
vocab AS (
  SELECT tok FROM (
    SELECT tok, COUNT(*) AS n,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rn
    FROM toks GROUP BY tok
  ) WHERE rn <= 1000
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST((1000 * SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)) // COUNT(*)
            AS BIGINT) AS oov_milli
FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
GROUP BY t.doc_id
"""


@register("vocab_oov_rates", _VOCAB_OOV_ORACLE)
def q_vocab_oov_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage audit: build the corpus top-1000 vocabulary
    (count-desc, token tie-break) and report each document's
    out-of-vocabulary token fraction — the fertility/coverage signal
    that decides whether a tokenizer (or fixed vocab) fits a corpus.
    The vocab is a broadcast dim; OOV testing is one left join +
    aggregation, integer milli output."""
    from pyspark.sql import Window as W

    docs = datasets.load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("n"))
    vocab = (
        counts.withColumn(
            "rn", F.row_number().over(W.orderBy(F.col("n").desc(), F.col("tok")))
        )
        .filter(F.col("rn") <= 1000)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.expr(
                "cast((1000 * sum(case when in_vocab is null then 1 else 0 end))"
                " div count(*) as long)"
            ).alias("oov_milli"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-source duplication matrix (shared 8-gram digests per source pair)
# ---------------------------------------------------------------------------

_SOURCE_OVERLAP_ORACLE = (
    "WITH "
    + _GRAMS_CTE.format(n=8, hi=7)
    + """,
sg AS (SELECT DISTINCT source, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh
       FROM grams),
sz AS (SELECT source, COUNT(*) AS n FROM sg GROUP BY source),
ov AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS shared
  FROM sg a JOIN sg b ON a.gh = b.gh AND a.source < b.source
  GROUP BY 1, 2
)
SELECT o.source_a, o.source_b, CAST(o.shared AS BIGINT) AS shared_grams,
       CAST(za.n AS BIGINT) AS n_a, CAST(zb.n AS BIGINT) AS n_b,
       CAST((1000 * o.shared) // (za.n + zb.n - o.shared) AS BIGINT)
         AS jaccard_milli
FROM ov o JOIN sz za ON za.source = o.source_a
JOIN sz zb ON zb.source = o.source_b
"""
)


@register("source_overlap_matrix", _SOURCE_OVERLAP_ORACLE)
def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which corpus sources duplicate each other: pairwise shared
    distinct word-8-gram digests with milli-Jaccard — the
    leakage/provenance diagnostic run before mixing sources (a
    crawl that mirrors another source shows up as a hot pair).
    Shuffle volume is one 60-bit digest per distinct (source, gram);
    the pair join fans out only on digests shared across sources."""
    from .functions.curation import word_ngrams
    from .hashutil import hash_prefix

    docs = datasets.load_table(spark, sf_dir, "documents")
    sg = (
        docs.select(
            "source", F.explode(word_ngrams("text", 8)).alias("gram")
        )
        .select("source", hash_prefix(F.col("gram"), 15).alias("gh"))
        .distinct()
        .localCheckpoint()
    )
    sz = sg.groupBy("source").agg(F.count("*").alias("n"))
    a = sg.select(F.col("source").alias("source_a"), "gh")
    b = sg.select(F.col("source").alias("source_b"), "gh")
    ov = (
        a.join(b, "gh")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("shared"))
    )
    za = sz.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    zb = sz.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        ov.join(F.broadcast(za), "source_a")
        .join(F.broadcast(zb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("shared").cast("long").alias("shared_grams"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr("cast((1000 * shared) div (n_a + n_b - shared) as long)")
            .alias("jaccard_milli"),
        )
    )


# ---------------------------------------------------------------------------
# Privacy audit: k-anonymity / l-diversity over quasi-identifiers
# ---------------------------------------------------------------------------

_KANON_ORACLE = """
WITH qi AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS group_size,
         CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) AS BIGINT)
           AS l_diversity
  FROM customer GROUP BY 1, 2
)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
       group_size, l_diversity,
       CAST(CASE WHEN group_size < 5 THEN 1 ELSE 0 END AS BIGINT) AS violates_k5,
       CAST(CASE WHEN l_diversity < 3 THEN 1 ELSE 0 END AS BIGINT) AS violates_l3
FROM qi
"""


@register("k_anonymity_audit", _KANON_ORACLE)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit before releasing a derived dataset: group sizes
    over the quasi-identifier pair (nation, market segment) —
    k-anonymity (groups smaller than k=5 re-identify) — and
    l-diversity of the sensitive attribute (balance bands; fewer than
    l=3 distinct values lets the group leak it).  One map-side-
    combined aggregate; at 100 TB the QI group count, not the row
    count, bounds the shuffle."""
    cust = datasets.load_table(spark, sf_dir, "customer")
    qi = cust.groupBy(
        F.col("c_nationkey").cast("long").alias("c_nationkey"), "c_mktsegment"
    ).agg(
        F.count("*").cast("long").alias("group_size"),
        F.countDistinct(F.floor(F.col("c_acctbal") / 1000).cast("long"))
        .cast("long")
        .alias("l_diversity"),
    )
    return qi.select(
        "c_nationkey",
        "c_mktsegment",
        "group_size",
        "l_diversity",
        (F.col("group_size") < 5).cast("long").alias("violates_k5"),
        (F.col("l_diversity") < 3).cast("long").alias("violates_l3"),
    )


# ---------------------------------------------------------------------------
# Corpus snapshot drift report (hash-split snapshots A/B)
# ---------------------------------------------------------------------------

_DRIFT_ORACLE = """
WITH dsnap AS (
  SELECT doc_id, source, n_chars, text,
         CASE WHEN ('0x' || substr(md5('snap|' || CAST(doc_id AS VARCHAR)),
                                   1, 8))::BIGINT % 2 = 0
              THEN 'A' ELSE 'B' END AS snap
  FROM documents
),
dcnt AS (
  SELECT source,
         SUM(CASE WHEN snap = 'A' THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN snap = 'B' THEN 1 ELSE 0 END) AS n_b,
         SUM(CASE WHEN snap = 'A' THEN n_chars ELSE 0 END) AS chars_a,
         SUM(CASE WHEN snap = 'B' THEN n_chars ELSE 0 END) AS chars_b
  FROM dsnap GROUP BY source
),
dvoc AS (
  SELECT source, tok, MAX(CASE WHEN snap = 'A' THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN snap = 'B' THEN 1 ELSE 0 END) AS in_b
  FROM (
    SELECT source, snap, UNNEST(string_split(text, ' ')) AS tok FROM dsnap
  ) WHERE tok <> '' GROUP BY source, tok
),
dj AS (
  SELECT source,
         SUM(in_a * in_b) AS vocab_common,
         SUM(GREATEST(in_a, in_b)) AS vocab_union
  FROM dvoc GROUP BY source
)
SELECT c.source,
       CAST(c.n_a AS BIGINT) AS n_a, CAST(c.n_b AS BIGINT) AS n_b,
       CAST(c.chars_a AS BIGINT) AS chars_a, CAST(c.chars_b AS BIGINT) AS chars_b,
       CAST(j.vocab_common AS BIGINT) AS vocab_common,
       CAST(j.vocab_union AS BIGINT) AS vocab_union,
       CAST(FLOOR(1e6 * j.vocab_common / j.vocab_union) AS BIGINT)
         AS vocab_jaccard_ppm
FROM dcnt c JOIN dj j USING (source)
"""


@register("corpus_snapshot_drift", _DRIFT_ORACLE)
def q_corpus_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source drift report between two corpus snapshots (here a
    deterministic hash split standing in for consecutive crawls):
    document and char-volume deltas plus vocabulary Jaccard — the
    triage table that decides which sources need re-curation after a
    refresh.  One pass for counts, one distinct-token pass for the
    vocabulary overlap; everything integer or ppm-quantized."""
    from .hashutil import hash_prefix

    docs = datasets.load_table(spark, sf_dir, "documents").withColumn(
        "snap",
        F.when(
            F.pmod(
                hash_prefix(
                    F.concat_ws("|", F.lit("snap"), F.col("doc_id").cast("string")), 8
                ),
                F.lit(2),
            )
            == 0,
            F.lit("A"),
        ).otherwise(F.lit("B")),
    )
    cnt = docs.groupBy("source").agg(
        F.sum((F.col("snap") == "A").cast("long")).alias("n_a"),
        F.sum((F.col("snap") == "B").cast("long")).alias("n_b"),
        F.sum(F.when(F.col("snap") == "A", F.col("n_chars")).otherwise(0)).alias(
            "chars_a"
        ),
        F.sum(F.when(F.col("snap") == "B", F.col("n_chars")).otherwise(0)).alias(
            "chars_b"
        ),
    )
    toks = (
        docs.select("source", "snap", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(
            F.max((F.col("snap") == "A").cast("long")).alias("in_a"),
            F.max((F.col("snap") == "B").cast("long")).alias("in_b"),
        )
    )
    voc = toks.groupBy("source").agg(
        F.sum(F.col("in_a") * F.col("in_b")).alias("vocab_common"),
        F.sum(F.greatest("in_a", "in_b")).alias("vocab_union"),
    )
    return cnt.join(voc, "source").select(
        "source",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("chars_a").cast("long").alias("chars_a"),
        F.col("chars_b").cast("long").alias("chars_b"),
        F.col("vocab_common").cast("long").alias("vocab_common"),
        F.col("vocab_union").cast("long").alias("vocab_union"),
        F.floor(F.lit(1e6) * F.col("vocab_common") / F.col("vocab_union"))
        .cast("long")
        .alias("vocab_jaccard_ppm"),
    )


# ---------------------------------------------------------------------------
# Per-document n-gram novelty rate (unique-to-this-doc trigram share)
# ---------------------------------------------------------------------------

_NOVEL_ORACLE = """
WITH nvt AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
nvg AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(toks, i, i + 2), ' ') AS ng
  FROM nvt, UNNEST(generate_series(1, greatest(len(toks) - 2, 0))) AS s(i)
),
nvdf AS (SELECT ng, COUNT(*) AS df FROM nvg GROUP BY ng)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_ngrams,
       CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(FLOOR(1e6 * SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) / COUNT(*))
            AS BIGINT) AS novelty_ppm
FROM nvg g JOIN nvdf d USING (ng)
GROUP BY g.doc_id
"""


@register("ngram_novelty_rates", _NOVEL_ORACLE)
def q_ngram_novelty_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the share of its distinct word trigrams
    that occur in NO other document — the inverse of boilerplate
    (novelty_ppm → 0 marks template/duplicated text, → 1e6 marks
    unique content).  One distinct-ngram pass, one document-frequency
    aggregate joined back on the ngram — the ``ngram_jaccard``
    inverted-index shape without the pair join."""
    docs = datasets.load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> x != '')").alias("toks"),
    )
    ng = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(size(toks) - 2, 1)),"
                    " i -> array_join(slice(toks, i, 3), ' '))"
                )
            ).alias("ng"),
        )
        .filter(F.size(F.split(F.col("ng"), " ")) == 3)
        .distinct()
        .localCheckpoint()
    )
    df = ng.groupBy("ng").agg(F.count("*").alias("df"))
    return (
        ng.join(df, "ng")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_ngrams"),
            F.sum((F.col("df") == 1).cast("long")).cast("long").alias("n_unique"),
        )
        .select(
            "doc_id",
            "n_ngrams",
            "n_unique",
            F.floor(F.lit(1e6) * F.col("n_unique") / F.col("n_ngrams"))
            .cast("long")
            .alias("novelty_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Character-class composition per source (corpus hygiene profile)
# ---------------------------------------------------------------------------

_CHARCLASS_ORACLE = """
WITH cdoc AS (
  SELECT source,
         CAST(len(text) AS BIGINT) AS n_chars,
         CAST(len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
         CAST(len(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
         CAST(len(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT) AS n_space
  FROM documents
)
SELECT source,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_alpha) AS BIGINT) AS alpha_chars,
       CAST(SUM(n_digit) AS BIGINT) AS digit_chars,
       CAST(SUM(n_space) AS BIGINT) AS space_chars,
       CAST(SUM(n_chars - n_alpha - n_digit - n_space) AS BIGINT) AS other_chars,
       CAST(FLOOR(1e6 * SUM(n_alpha) / SUM(n_chars)) AS BIGINT) AS alpha_ppm
FROM cdoc GROUP BY source
"""


@register("char_class_profile", _CHARCLASS_ORACLE)
def q_char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per source (alpha/digit/space/other
    counts and alpha share) — the first-pass hygiene profile that
    flags binary-junk or table-dump sources before tokenization.
    Class-only regexes (the ``BPE_PIECE_RE`` portability rule), pure
    counting, one aggregate."""
    docs = datasets.load_table(spark, sf_dir, "documents")
    cdoc = docs.select(
        "source",
        F.length("text").cast("long").alias("n_chars"),
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("long").alias(
            "n_alpha"
        ),
        F.length(F.regexp_replace("text", "[^0-9]", "")).cast("long").alias("n_digit"),
        F.length(F.regexp_replace("text", "[^ ]", "")).cast("long").alias("n_space"),
    )
    return cdoc.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("n_alpha").cast("long").alias("alpha_chars"),
        F.sum("n_digit").cast("long").alias("digit_chars"),
        F.sum("n_space").cast("long").alias("space_chars"),
        F.sum(
            F.col("n_chars") - F.col("n_alpha") - F.col("n_digit") - F.col("n_space")
        )
        .cast("long")
        .alias("other_chars"),
        F.floor(F.lit(1e6) * F.sum("n_alpha") / F.sum("n_chars"))
        .cast("long")
        .alias("alpha_ppm"),
    )


# ---------------------------------------------------------------------------
# Quantile normalization of quality scores across sources
# ---------------------------------------------------------------------------

from .queries_graphops import _QUALITY_ORACLE as _QSRC_ORACLE

_QNORM_ORACLE = f"""
WITH qq AS (
  SELECT q.doc_id, d.source,
         CAST(FLOOR(1e6 * q.quality) AS BIGINT) AS q_micro
  FROM ({_QSRC_ORACLE.strip()}) q
  JOIN documents d USING (doc_id)
),
qsr AS (
  SELECT doc_id, source, q_micro,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY q_micro, doc_id) AS r,
         COUNT(*) OVER (PARTITION BY source) AS ns
  FROM qq
),
qgr AS (
  SELECT q_micro AS g_value,
         ROW_NUMBER() OVER (ORDER BY q_micro, doc_id) AS g,
         COUNT(*) OVER () AS n
  FROM qq
),
qmap AS (
  SELECT s.doc_id, s.source, s.q_micro,
         GREATEST(1, (s.r * (SELECT MAX(n) FROM qgr)) // s.ns) AS g_target
  FROM qsr s
)
SELECT m.doc_id, m.source, m.q_micro,
       CAST(g.g_value AS BIGINT) AS q_norm_micro
FROM qmap m JOIN qgr g ON g.g = m.g_target
"""


@register("quality_quantile_norm", _QNORM_ORACLE)
def q_quality_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of quality scores ACROSS sources (the
    batch-effect correction of expression arrays, applied to corpus
    quality): each document's within-source rank maps to the global
    score at the same relative rank — ``g = max(1, r·N div n_s)`` is
    pure integer arithmetic, so a strict source is no longer punished
    relative to a lenient one by its own scale.  The per-source rank
    is a partitioned window (parallel across sources); the GLOBAL rank
    is :func:`operators.prefix.range_row_number` — never a single-task
    ``Window.orderBy`` over the O(docs) table."""
    from .functions.textstats import quality_score
    from .operators.prefix import range_row_number

    docs = datasets.load_table(spark, sf_dir, "documents")
    qq = quality_score(docs).join(docs.select("doc_id", "source"), "doc_id").select(
        "doc_id",
        "source",
        F.floor(F.lit(1e6) * F.col("quality")).cast("long").alias("q_micro"),
    ).localCheckpoint()
    ws = Window.partitionBy("source").orderBy("q_micro", "doc_id")
    wsn = Window.partitionBy("source")
    qsr = qq.withColumn("r", F.row_number().over(ws)).withColumn(
        "ns", F.count("*").over(wsn)
    )
    qgr = range_row_number(
        qq.select("q_micro", "doc_id"), [F.col("q_micro"), F.col("doc_id")], "g"
    )
    n_total = qq.count()
    qmap = qsr.select(
        "doc_id",
        "source",
        "q_micro",
        F.greatest(F.lit(1), F.expr(f"(r * {n_total}) div ns")).alias("g_target"),
    )
    return qmap.join(
        qgr.select(F.col("g").alias("g_target"), F.col("q_micro").alias("q_norm_micro")),
        "g_target",
    ).select("doc_id", "source", "q_micro", F.col("q_norm_micro").cast("long"))


# ---------------------------------------------------------------------------
# DSIR importance weights toward an English target (Xie et al. 2023)
# ---------------------------------------------------------------------------

_DSIR_ORACLE = """
WITH warr AS MATERIALIZED (
  SELECT doc_id, lang, string_split(text, ' ') AS a FROM documents
),
grams AS (
  SELECT doc_id, lang, a[i] AS gram
  FROM warr, UNNEST(generate_series(1, len(a))) AS t(i)
  UNION ALL
  SELECT doc_id, lang, a[i] || ' ' || a[i + 1] AS gram
  FROM warr, UNNEST(generate_series(1, len(a) - 1)) AS t(i)
),
feats AS MATERIALIZED (
  SELECT doc_id, lang,
         ('0x' || substr(md5('dsir|' || gram), 1, 8))::BIGINT % 8192 AS b
  FROM grams
),
tot AS (
  SELECT COUNT(*) AS r, COUNT(*) FILTER (WHERE lang = 'en') AS t FROM feats
),
cr AS MATERIALIZED (SELECT b, COUNT(*) AS cr FROM feats GROUP BY 1),
ct AS MATERIALIZED (
  SELECT b, COUNT(*) AS ct FROM feats WHERE lang = 'en' GROUP BY 1
),
w AS (
  -- two lns of exact-long ratios (overflow-safe: no int64 products),
  -- mirroring functions/curation.py dsir_logratios bit-for-bit
  SELECT cr.b, CAST(ROUND(1e6 * (
    LN((COALESCE(ct.ct, 0) + 1) * 1e0 / (cr.cr + 1))
    + LN((tot.r + 8192) * 1e0 / (tot.t + 8192))
  )) AS BIGINT) AS lp
  FROM cr LEFT JOIN ct ON cr.b = ct.b, tot
)
SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
       CAST(SUM(w.lp) AS BIGINT) AS dsir_micro
FROM feats f JOIN w ON f.b = w.b
GROUP BY 1
"""


@register("dsir_en_logratios", _DSIR_ORACLE)
def q_dsir_en_logratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS 2023) of every
    document toward the English-language subset as the target
    distribution: hashed unigram+bigram multinomials, add-one
    smoothing, per-doc summed log-ratio in exact integer micros.  The
    pretraining-data-selection primitive — rank by ``dsir_micro`` and
    resample the top of the raw corpus.  See
    :func:`~graphdb_testing_spark.functions.curation.dsir_logratios`."""
    docs = datasets.load_table(spark, sf_dir, "documents")
    return curation.dsir_logratios(docs, docs.filter(F.col("lang") == "en"))


# ---------------------------------------------------------------------------
# DSIR resampling: Gumbel top-k draw from softmax(dsir/tau)
# ---------------------------------------------------------------------------

# the DSIR weight CTE is reused verbatim as a subquery; the Gumbel key
# mirrors functions/curation.py gumbel_topk_sample op-for-op
_DSIR_GUMBEL_ORACLE = f"""
SELECT doc_id, CAST(ROUND(1e6 * gkey) AS BIGINT) AS gkey_micro
FROM (
  SELECT doc_id,
         (dsir_micro * 1e-6) / 8.0
         - LN(-LN((('0x' || substr(md5('gumbel-v1' || '|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
                  / 4294967296.0)) AS gkey
  FROM ({_DSIR_ORACLE}) d
)
ORDER BY gkey DESC, doc_id
LIMIT 100
"""


@register("dsir_gumbel_resample", _DSIR_GUMBEL_ORACLE)
def q_dsir_gumbel_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resampling half of DSIR (Xie et al., NeurIPS 2023): a
    deterministic Gumbel top-k draw of 100 documents from
    ``softmax(dsir/8)`` over the English-target importance weights —
    weighted sampling without replacement via the Gumbel-max trick
    (Kool et al., ICML 2019), with portable hash noise so the sample
    is identical across engines, retries, and cluster sizes.  See
    :func:`~graphdb_testing_spark.functions.curation.gumbel_topk_sample`."""
    docs = datasets.load_table(spark, sf_dir, "documents")
    scored = curation.dsir_logratios(
        docs, docs.filter(F.col("lang") == "en")
    ).withColumn("w", F.col("dsir_micro") * F.lit(1e-6))
    return curation.gumbel_topk_sample(scored, k=100, weight_col="w", tau=8.0).select(
        "doc_id", "gkey_micro"
    )


# ---------------------------------------------------------------------------
# UniMax language budgets (epoch-capped waterfill, Chung et al. 2023)
# ---------------------------------------------------------------------------

# budget = 2x the corpus token count with a 4-epoch cap: small
# languages hit the cap, big ones split the remainder — both branches
# of the waterfill are exercised at every sf.
_UNIMAX_ORACLE = """
WITH tok AS (
  SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
tt AS (SELECT 2 * SUM(n_tokens) AS t FROM tok),
caps AS (
  SELECT lang, n_tokens, n_tokens * 4 AS cap,
         ROW_NUMBER() OVER (ORDER BY n_tokens * 4, lang) AS i,
         COALESCE(SUM(n_tokens * 4) OVER (ORDER BY n_tokens * 4, lang
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prevsum,
         COUNT(*) OVER () AS n
  FROM tok
),
flag AS (
  SELECT caps.*, tt.t,
         CASE WHEN cap * (n - i + 1) <= t - prevsum THEN 1 ELSE 0 END AS capped
  FROM caps, tt
),
scal AS (
  SELECT COALESCE(SUM(cap) FILTER (WHERE capped = 1), 0) AS c,
         COUNT(*) FILTER (WHERE capped = 0) AS u
  FROM flag
),
alloc AS (
  SELECT lang, n_tokens, cap,
         CASE WHEN capped = 1 THEN cap
              ELSE (t - c) // u
                   + CASE WHEN (i - (n - u)) <= (t - c) % u THEN 1 ELSE 0 END
         END AS budget_tokens
  FROM flag, scal
)
SELECT lang, n_tokens, cap,
       CAST(budget_tokens AS BIGINT) AS budget_tokens,
       CAST((1000 * budget_tokens) // n_tokens AS BIGINT) AS epochs_milli
FROM alloc
"""


@register("unimax_lang_budgets", _UNIMAX_ORACLE)
def q_unimax_lang_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax mixture allocation (Chung et al., ICLR 2023) over the
    corpus languages: total budget = 2x corpus tokens, 4-epoch cap per
    language, integer-exact waterfill.  See
    :func:`~graphdb_testing_spark.functions.curation.unimax_budgets`."""
    docs = datasets.load_table(spark, sf_dir, "documents")
    total = docs.agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long")
    ).collect()[0][0]
    return curation.unimax_budgets(docs, total_budget=2 * int(total), max_epochs=4)


# ---------------------------------------------------------------------------
# token-balanced shard plan (training ingestion layout)
# ---------------------------------------------------------------------------

_SHARD_PLAN_ORACLE = """
WITH toks AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
ranked AS (
  SELECT doc_id, n_tokens,
         ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS r
  FROM toks
),
planned AS (
  SELECT doc_id, n_tokens,
         CASE WHEN (r // 8) % 2 = 0 THEN r % 8 ELSE 7 - (r % 8) END AS shard
  FROM ranked
)
SELECT doc_id, n_tokens, CAST(shard AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY shard
         ORDER BY ('0x' || substr(md5('shard-v1|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                  doc_id
       ) AS BIGINT) AS pos
FROM planned
"""


@register("shard_plan_balanced", _SHARD_PLAN_ORACLE)
def q_shard_plan_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced 8-shard training layout: boustrophedon deal over
    the global token ranking (per-shard totals within one document of
    each other), deterministic md5 shuffle order within each shard.
    See
    :func:`~graphdb_testing_spark.functions.curation.shard_plan_balanced`."""
    docs = datasets.load_table(spark, sf_dir, "documents")
    return curation.shard_plan_balanced(docs, n_shards=8)


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, Appendix A1.1)
# ---------------------------------------------------------------------------

_GOPHER_CTES = """base AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w,
         string_split(text, chr(10)) AS lines
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_words,
         CAST(len(lines) AS BIGINT) AS n_lines,
         COALESCE(list_sum(list_transform(w, x -> len(x))), 0) AS sum_wl,
         len(text) - len(replace(text, '#', '')) AS n_hash,
         (len(text) - len(replace(text, '...', ''))) / 3.0 AS n_ell,
         len(list_filter(lines,
             x -> starts_with(x, '•') OR starts_with(x, '- '))) AS n_bullet,
         len(list_filter(lines, x -> ends_with(x, '...'))) AS n_ell_lines,
         len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
         (CAST(list_contains(w, 'the') AS BIGINT)
          + CAST(list_contains(w, 'be') AS BIGINT)
          + CAST(list_contains(w, 'to') AS BIGINT)
          + CAST(list_contains(w, 'of') AS BIGINT)
          + CAST(list_contains(w, 'and') AS BIGINT)
          + CAST(list_contains(w, 'that') AS BIGINT)
          + CAST(list_contains(w, 'have') AS BIGINT)
          + CAST(list_contains(w, 'with') AS BIGINT)) AS n_stop
  FROM base
),
r AS (
  SELECT doc_id, n_words,
         CASE WHEN n_words = 0 THEN 0.0
              ELSE ROUND(sum_wl / CAST(n_words AS DOUBLE), 6) END AS mean_word_len,
         CASE WHEN n_words = 0 THEN 0.0
              ELSE ROUND((n_hash + n_ell) / CAST(n_words AS DOUBLE), 6) END
           AS symbol_word_ratio,
         ROUND(n_bullet / CAST(n_lines AS DOUBLE), 6) AS bullet_line_frac,
         ROUND(n_ell_lines / CAST(n_lines AS DOUBLE), 6) AS ellipsis_line_frac,
         CASE WHEN n_words = 0 THEN 0.0
              ELSE ROUND(n_alpha / CAST(n_words AS DOUBLE), 6) END AS alpha_word_frac,
         n_stop AS n_stop_present
  FROM m
)"""

_GOPHER_ORACLE = f"""
WITH {_GOPHER_CTES}
SELECT *,
       (CAST(n_words BETWEEN 50 AND 100000 AS BIGINT)
        + CAST(mean_word_len BETWEEN 3.0 AND 10.0 AS BIGINT)
        + CAST(symbol_word_ratio <= 0.1 AS BIGINT)
        + CAST(bullet_line_frac < 0.9 AS BIGINT)
        + CAST(ellipsis_line_frac < 0.3 AS BIGINT)
        + CAST(alpha_word_frac >= 0.8 AS BIGINT)
        + CAST(n_stop_present >= 2 AS BIGINT)) AS n_rules_passed,
       CAST(n_words BETWEEN 50 AND 100000
            AND mean_word_len BETWEEN 3.0 AND 10.0
            AND symbol_word_ratio <= 0.1
            AND bullet_line_frac < 0.9
            AND ellipsis_line_frac < 0.3
            AND alpha_word_frac >= 0.8
            AND n_stop_present >= 2 AS BIGINT) AS gopher_pass
FROM r
"""


@register("gopher_quality_flags", _GOPHER_ORACLE)
def q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All seven Gopher quality rules per document (Rae et al. 2021) —
    word-count band, mean-word-length band, symbol ratio, bullet/
    ellipsis line fractions, alphabetic-word fraction, stop-word
    presence — plus the conjunction gate.  Map-only, no shuffle.  See
    :func:`~graphdb_testing_spark.functions.textstats.gopher_quality`."""
    from .functions import textstats

    docs = datasets.load_table(spark, sf_dir, "documents")
    return textstats.gopher_quality(docs)


# ---------------------------------------------------------------------------
# Composed pipeline report: quality gate -> dedup among survivors
# ---------------------------------------------------------------------------

#: Gate at >= 6 of 7 Gopher rules: rule 7 (>= 2 of the 8 Gopher stop
#: words) is degenerate on the synthetic vocabulary (only "the"
#: occurs), so the full conjunction keeps nothing — the >= 6 gate is
#: the corpus-appropriate relaxation and is discriminative here.
_RETENTION_REPORT_ORACLE_TMPL = """
WITH {GOPHER},
gq AS (
  SELECT doc_id, n_words,
         (CAST(n_words BETWEEN 50 AND 100000 AS BIGINT)
          + CAST(mean_word_len BETWEEN 3.0 AND 10.0 AS BIGINT)
          + CAST(symbol_word_ratio <= 0.1 AS BIGINT)
          + CAST(bullet_line_frac < 0.9 AS BIGINT)
          + CAST(ellipsis_line_frac < 0.3 AS BIGINT)
          + CAST(alpha_word_frac >= 0.8 AS BIGINT)
          + CAST(n_stop_present >= 2 AS BIGINT)) AS n_rules_passed
  FROM r
),
qdocs AS MATERIALIZED (
  SELECT d.doc_id, d.text FROM documents d
  JOIN gq ON gq.doc_id = d.doc_id AND gq.n_rules_passed >= 6
),
{RETENTION},
man AS (
  SELECT q.doc_id,
         CAST(q.doc_id = COALESCE(l.label, q.doc_id) AS BIGINT) AS keep
  FROM qdocs q LEFT JOIN dlbl l ON l.id = q.doc_id
)
SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs,
       CAST((SELECT COUNT(*) FROM gq WHERE n_rules_passed < 6) AS BIGINT)
         AS n_quality_fail,
       CAST(SUM(1 - m.keep) AS BIGINT) AS n_dedup_dropped,
       CAST(SUM(m.keep) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN m.keep = 1 THEN g.n_words ELSE 0 END) AS BIGINT)
         AS tokens_kept,
       ROUND(SUM(m.keep)
             / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE), 6)
         AS frac_kept
FROM man m JOIN gq g ON g.doc_id = m.doc_id
"""


def _retention_report_oracle() -> str:
    from .queries_pipeline import _retention_cc_ctes

    return _RETENTION_REPORT_ORACLE_TMPL.replace(
        "{GOPHER}", _GOPHER_CTES.strip()
    ).replace("{RETENTION}", _retention_cc_ctes(src="qdocs").strip())


@register("corpus_retention_report", _retention_report_oracle())
def q_corpus_retention_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-prep accounting in one row: Gopher quality
    gate (≥ 6 of 7 rules — see the oracle note on rule 7) followed by
    near-dup retention among the survivors; reports documents failing
    quality, documents dropped as duplicates, documents and whitespace
    tokens kept, and the kept fraction — the summary a 100 TB
    filtering run publishes next to its output.  Composes
    :func:`~graphdb_testing_spark.functions.textstats.gopher_quality`
    and :func:`~graphdb_testing_spark.functions.dedup.dedup_retention`;
    every stage inherits their scale shapes (map-only gate, collapsed
    LSH dedup, scalar rollup)."""
    from .functions import dedup, textstats

    docs = datasets.load_table(spark, sf_dir, "documents")
    g = textstats.gopher_quality(docs).localCheckpoint()
    qids = g.filter(F.col("n_rules_passed") >= 6).select("doc_id")
    qdocs = docs.join(qids, "doc_id", "left_semi")
    man = dedup.dedup_retention(qdocs, threshold=0.8)
    stats = g.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("n_rules_passed") < 6).cast("long"))
        .cast("long")
        .alias("n_quality_fail"),
    )
    dd = (
        man.join(g.select("doc_id", "n_words"), "doc_id")
        .agg(
            F.sum(1 - F.col("keep")).cast("long").alias("n_dedup_dropped"),
            F.sum("keep").cast("long").alias("n_kept"),
            F.sum(F.when(F.col("keep") == 1, F.col("n_words")).otherwise(0))
            .cast("long")
            .alias("tokens_kept"),
        )
    )
    return (
        stats.crossJoin(F.broadcast(dd))
        .select(
            "n_docs",
            "n_quality_fail",
            "n_dedup_dropped",
            "n_kept",
            "tokens_kept",
            F.round(F.col("n_kept") / F.col("n_docs"), 6).alias("frac_kept"),
        )
    )


# ---------------------------------------------------------------------------
# round-7: duplication accounting — concentration curve + per-source report
# ---------------------------------------------------------------------------

_RETENTION_MAN_CTE = """
man AS (
  SELECT d.doc_id, d.source,
         CAST(COALESCE(l.label, d.doc_id) AS BIGINT) AS cluster_id,
         CAST(COALESCE(z.n, 1) AS BIGINT) AS cluster_size,
         CAST(d.doc_id = COALESCE(l.label, d.doc_id) AS BIGINT) AS keep
  FROM documents d
  LEFT JOIN dlbl l ON l.id = d.doc_id
  LEFT JOIN dsz z ON z.label = l.label
)"""


def _duplication_pareto_oracle() -> str:
    from .queries_pipeline import _retention_cc_ctes

    return f"""
WITH {_retention_cc_ctes().strip()},
{_RETENTION_MAN_CTE.strip()},
spec AS (
  SELECT cluster_size,
         CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
         CAST(COUNT(*) AS BIGINT) AS docs_covered
  FROM man GROUP BY cluster_size
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size, n_clusters, docs_covered,
       ROUND(SUM(docs_covered) OVER (ORDER BY cluster_size DESC)
             / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE), 6)
         AS cum_doc_frac
FROM spec
"""


@register("duplication_pareto", _duplication_pareto_oracle())
def q_duplication_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication concentration curve: the near-dup cluster-size
    spectrum with the cumulative share of documents covered by
    clusters of that size or larger — the accounting a curation run
    publishes to show whether duplication is a few huge clusters (one
    boilerplate page copied everywhere) or a long tail.  Composes
    :func:`~graphdb_testing_spark.functions.dedup.dedup_retention`;
    the spectrum aggregate is map-side-combined on cluster_size and
    the cumulative window runs over the ~|distinct sizes| spectrum
    rows, never the corpus."""
    from .functions import dedup

    docs = datasets.load_table(spark, sf_dir, "documents")
    man = dedup.dedup_retention(docs, threshold=0.8)
    n_docs = docs.count()
    spec = man.groupBy("cluster_size").agg(
        F.count_distinct("cluster_id").cast("long").alias("n_clusters"),
        F.count("*").cast("long").alias("docs_covered"),
    )
    w = Window.orderBy(F.col("cluster_size").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return spec.select(
        "cluster_size",
        "n_clusters",
        "docs_covered",
        F.round(F.sum("docs_covered").over(w) / F.lit(n_docs), 6).alias(
            "cum_doc_frac"
        ),
    )


def _retention_by_source_oracle() -> str:
    from .queries_pipeline import _retention_cc_ctes

    return f"""
WITH {_retention_cc_ctes().strip()},
{_RETENTION_MAN_CTE.strip()}
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(keep) AS BIGINT) AS n_kept,
       CAST(SUM(1 - keep) AS BIGINT) AS n_dropped,
       ROUND(SUM(keep) / CAST(COUNT(*) AS DOUBLE), 6) AS frac_kept
FROM man GROUP BY source
"""


@register("retention_by_source", _retention_by_source_oracle())
def q_retention_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup accounting: documents, kept, dropped, and the
    kept fraction for each ingestion source under the near-dup
    retention policy — the table that tells a corpus owner WHICH feed
    is producing the duplication (mirror sites and syndicated feeds
    show up as low frac_kept).  One equi-join of the manifest back to
    the (doc_id, source) projection and a 20-group aggregate."""
    from .functions import dedup

    docs = datasets.load_table(spark, sf_dir, "documents")
    man = dedup.dedup_retention(docs, threshold=0.8)
    return (
        man.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("keep").cast("long").alias("n_kept"),
            F.sum(1 - F.col("keep")).cast("long").alias("n_dropped"),
            F.round(F.sum("keep") / F.count("*"), 6).alias("frac_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher repetition rules (Rae et al. 2021, Appendix A1.2)
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = """
WITH rep AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w
  FROM documents
),
ln AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM documents
),
lcnt AS (
  SELECT doc_id, l, COUNT(*) AS c, len(l) AS ll FROM ln GROUP BY 1, 2
),
ldup AS (
  SELECT doc_id,
         ROUND((SUM(c) - COUNT(*)) / CAST(SUM(c) AS DOUBLE), 6)
           AS dup_line_frac,
         ROUND(COALESCE(SUM(CASE WHEN c > 1 THEN c * ll ELSE 0 END)
               / CAST(NULLIF(SUM(c * ll), 0) AS DOUBLE), 0), 6)
           AS dup_line_char_frac
  FROM lcnt GROUP BY doc_id
),
g2 AS (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
       FROM rep, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
       WHERE len(w) >= 2),
g3 AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g
       FROM rep, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
       WHERE len(w) >= 3),
g4 AS (SELECT doc_id, array_to_string(w[i:i+3], ' ') AS g
       FROM rep, UNNEST(generate_series(1, len(w) - 3)) AS t(i)
       WHERE len(w) >= 4),
t2 AS (SELECT doc_id, MAX(struct_pack(c := c, cov := c * gl)) AS t
       FROM (SELECT doc_id, g, COUNT(*) AS c, len(g) AS gl
             FROM g2 GROUP BY 1, 2) GROUP BY doc_id),
t3 AS (SELECT doc_id, MAX(struct_pack(c := c, cov := c * gl)) AS t
       FROM (SELECT doc_id, g, COUNT(*) AS c, len(g) AS gl
             FROM g3 GROUP BY 1, 2) GROUP BY doc_id),
t4 AS (SELECT doc_id, MAX(struct_pack(c := c, cov := c * gl)) AS t
       FROM (SELECT doc_id, g, COUNT(*) AS c, len(g) AS gl
             FROM g4 GROUP BY 1, 2) GROUP BY doc_id),
f AS (
  SELECT d.doc_id,
         ld.dup_line_frac,
         ld.dup_line_char_frac,
         ROUND(COALESCE((t2.t).cov / CAST(NULLIF(len(d.text), 0) AS DOUBLE), 0), 6)
           AS top2gram_char_frac,
         ROUND(COALESCE((t3.t).cov / CAST(NULLIF(len(d.text), 0) AS DOUBLE), 0), 6)
           AS top3gram_char_frac,
         ROUND(COALESCE((t4.t).cov / CAST(NULLIF(len(d.text), 0) AS DOUBLE), 0), 6)
           AS top4gram_char_frac
  FROM documents d
  JOIN ldup ld ON ld.doc_id = d.doc_id
  LEFT JOIN t2 ON t2.doc_id = d.doc_id
  LEFT JOIN t3 ON t3.doc_id = d.doc_id
  LEFT JOIN t4 ON t4.doc_id = d.doc_id
)
SELECT *,
       (CAST(dup_line_frac <= 0.30 AS BIGINT)
        + CAST(dup_line_char_frac <= 0.20 AS BIGINT)
        + CAST(top2gram_char_frac <= 0.20 AS BIGINT)
        + CAST(top3gram_char_frac <= 0.18 AS BIGINT)
        + CAST(top4gram_char_frac <= 0.16 AS BIGINT)) AS n_rep_rules_passed,
       CAST(dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.20
            AND top2gram_char_frac <= 0.20 AND top3gram_char_frac <= 0.18
            AND top4gram_char_frac <= 0.16 AS BIGINT) AS repetition_pass
FROM f
"""


@register("gopher_repetition_flags", _REPETITION_ORACLE)
def q_gopher_repetition_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition rules per document (Rae et al. 2021, Appendix
    A1.2): duplicate-line fraction and character share, plus the
    character coverage of the single densest word 2/3/4-gram, with the
    paper's thresholds folded into a pass flag — the within-document
    repetition gate that complements ``gopher_quality_flags``.  Three
    map-side-combined n-gram counts + one line count; no corpus-wide
    window.  See
    :func:`~graphdb_testing_spark.functions.textstats.gopher_repetition`."""
    from .functions import textstats

    docs = datasets.load_table(spark, sf_dir, "documents")
    return textstats.gopher_repetition(docs)


# ---------------------------------------------------------------------------
# CCNet per-language perplexity buckets (Wenzek et al. 2020)
# ---------------------------------------------------------------------------

_CCNET_ORACLE = """
WITH cn_wa AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS a FROM documents
),
cn_bg AS MATERIALIZED (
  SELECT doc_id, a[i] AS w1, a[i + 1] AS w2
  FROM cn_wa, UNNEST(generate_series(1, len(a) - 1)) AS t(i)
),
cn_vocab AS (
  SELECT COUNT(DISTINCT a[i]) AS v
  FROM cn_wa, UNNEST(generate_series(1, len(a))) AS t(i)
),
cn_cbg AS MATERIALIZED (SELECT w1, w2, COUNT(*) AS cbg FROM cn_bg GROUP BY 1, 2),
cn_cctx AS MATERIALIZED (SELECT w1, COUNT(*) AS cctx FROM cn_bg GROUP BY 1),
cn_lm AS (
  SELECT b.doc_id, COUNT(*) AS n,
         SUM(CAST(ROUND(1e6 * LN((c.cbg + 1) * 1e0
                 / (x.cctx + (SELECT v FROM cn_vocab)))) AS BIGINT)) AS s
  FROM cn_bg b JOIN cn_cbg c USING (w1, w2) JOIN cn_cctx x USING (w1)
  GROUP BY b.doc_id
),
cn_sc AS (
  SELECT l.doc_id, d.lang, CAST(l.s // l.n AS BIGINT) AS avg_logp_micro
  FROM cn_lm l JOIN documents d USING (doc_id)
)
SELECT doc_id, lang, avg_logp_micro, ppl_bucket,
       CASE WHEN ppl_bucket = 1 THEN 'head'
            WHEN ppl_bucket = 3 THEN 'tail'
            ELSE 'middle' END AS bucket_label
FROM (
  SELECT doc_id, lang, avg_logp_micro,
         CAST(NTILE(3) OVER (PARTITION BY lang
                             ORDER BY -avg_logp_micro, doc_id) AS BIGINT)
           AS ppl_bucket
  FROM cn_sc)
"""


@register("ccnet_perplexity_buckets", _CCNET_ORACLE)
def q_ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail terciles (Wenzek et al. 2020): each
    language's documents split by corpus-bigram-LM perplexity; head =
    most fluent third.  Within-language ranking runs as ONE global
    range shuffle + broadcast rank bases — never a per-language
    window.  See :func:`~graphdb_testing_spark.functions.curation.
    ccnet_perplexity_buckets`."""
    docs = datasets.load_table(spark, sf_dir, "documents")
    return curation.ccnet_perplexity_buckets(docs, k=3)


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk): where every document's tokens
# land in the fixed-capacity training chunks
# ---------------------------------------------------------------------------

_PACKING_ORACLE = """
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
           AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_off
  FROM t
)
SELECT doc_id, n_tokens, start_off,
       start_off // 2048 AS first_chunk,
       CASE WHEN n_tokens > 0 THEN (start_off + n_tokens - 1) // 2048
            ELSE start_off // 2048 END AS last_chunk,
       CASE WHEN n_tokens > 0 THEN (start_off + n_tokens - 1) // 2048
            ELSE start_off // 2048 END - start_off // 2048 + 1 AS n_chunks,
       CAST(CASE WHEN n_tokens > 0 THEN (start_off + n_tokens - 1) // 2048
            ELSE start_off // 2048 END > start_off // 2048 AS BIGINT)
         AS spans_boundary
FROM c
"""


@register("sequence_packing_plan", _PACKING_ORACLE)
def q_sequence_packing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing plan at capacity 2048: per-document
    global token offset and chunk span.  The oracle's single-partition
    ``SUM() OVER (ORDER BY)`` is exactly the plan Spark must NOT run
    at scale — the Spark side uses the range-shuffle prefix sum
    instead and must match it row-for-row.  See
    :func:`~graphdb_testing_spark.functions.curation.
    sequence_packing_plan`."""
    docs = datasets.load_table(spark, sf_dir, "documents")
    return curation.sequence_packing_plan(docs, capacity=2048)


# ---------------------------------------------------------------------------
# per-source unigram KL divergence (corpus drift / domain mixing)
# ---------------------------------------------------------------------------

_SOURCE_KL_ORACLE = """
WITH w AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS word FROM documents
),
sw AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1, 2),
s AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ns,
             CAST(COUNT(*) AS BIGINT) AS n_types FROM sw GROUP BY 1),
cw AS (SELECT word, CAST(SUM(c) AS BIGINT) AS cq FROM sw GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM sw)
SELECT source, ns AS n_tokens, n_types,
       CAST(SUM(ROUND(1000000.0 * (c / ns)
                      * ln((c / ns) / (cq / n)))) AS BIGINT) AS kl_micro
FROM sw JOIN s USING (source) JOIN cw USING (word) CROSS JOIN tot
GROUP BY source, ns, n_types
"""


@register("source_unigram_kl", _SOURCE_KL_ORACLE)
def q_source_unigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL(P_source || P_corpus) over word unigrams, in
    integer micronats — the domain-mixing drift diagnostic of a
    multi-source corpus.  Term-wise micro quantization (one rounding
    of one ln) keeps the distributed sum order-independent and
    engine-portable.  See :func:`~graphdb_testing_spark.functions.
    textstats.source_unigram_kl`."""
    from .functions import textstats

    docs = datasets.load_table(spark, sf_dir, "documents")
    return textstats.source_unigram_kl(docs)


# ---------------------------------------------------------------------------
# shared contiguous spans (exact-substring dedup witnesses)
# ---------------------------------------------------------------------------

_SHARED_SPAN_ORACLE = """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(array_to_string(w[i:i+9], ' ')), 1, 15))::BIGINT AS gh
  FROM words, UNNEST(generate_series(1, len(w) - 9)) AS t(i)
  WHERE len(w) >= 10
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(COUNT(*) AS BIGINT) AS n_shared_spans
FROM grams a JOIN grams b ON a.gh = b.gh AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


@register("shared_span_pairs", _SHARED_SPAN_ORACLE)
def q_shared_span_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing a 10-word contiguous span — the k-gram
    witness form of exact-substring deduplication (Lee et al. 2021's
    suffix-array criterion, re-expressed as a span-digest equi-join).
    See :func:`~graphdb_testing_spark.functions.dedup.
    shared_span_pairs`."""
    from .functions import dedup as ddp

    docs = datasets.load_table(spark, sf_dir, "documents")
    return ddp.shared_span_pairs(docs, n=10)


_SPAN_EXPOSURE_ORACLE = """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(array_to_string(w[i:i+9], ' ')), 1, 15))::BIGINT AS gh
  FROM words, UNNEST(generate_series(1, len(w) - 9)) AS t(i)
  WHERE len(w) >= 10
),
sdf AS (SELECT gh, COUNT(*) AS df FROM grams GROUP BY gh),
per_doc AS (
  SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
         CAST(SUM(CASE WHEN s.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_shared_spans
  FROM grams g JOIN sdf s USING (gh) GROUP BY g.doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_spans, 0) AS n_spans,
       COALESCE(p.n_shared_spans, 0) AS n_shared_spans,
       CASE WHEN COALESCE(p.n_spans, 0) > 0
            THEN ROUND(p.n_shared_spans * 1.0 / p.n_spans, 6)
            ELSE 0.0 END AS shared_frac
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


@register("span_duplication_exposure", _SPAN_EXPOSURE_ORACLE)
def q_span_duplication_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fraction of 10-word spans that also occur
    elsewhere in the corpus — the remove-vs-trim signal of
    substring-level dedup; computed without pair enumeration (span
    document-frequency aggregate + join back).  See
    :func:`~graphdb_testing_spark.functions.dedup.
    span_duplication_exposure`."""
    from .functions import dedup as ddp

    docs = datasets.load_table(spark, sf_dir, "documents")
    return ddp.span_duplication_exposure(docs, n=10)
