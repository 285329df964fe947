"""Text analysis over the ``documents`` table: token stats, quality
scoring, language identification, document fingerprinting.

Everything is whitespace-token arithmetic on JVM-side functions —
no Python UDFs.  Each operator has an exact SQL oracle (the token
explode is ``split(text, ' ')`` ≡ DuckDB
``unnest(string_split(text, ' '))``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword heuristic
#: language identifier (documents.lang ∈ {en, de, fr, es, zh})
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "du", "que"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "de", "que", "por"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不", "这", "个"),
}


def tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(doc_id, tok)`` whitespace tokens, empties dropped."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")


def text_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document stats: ``(doc_id, n_chars, n_tokens,
    avg_token_len, n_distinct_tokens, distinct_ratio)``.

    ``distinct_ratio`` (type/token ratio) is the quality signal the
    repetition-heavy junk documents fail.
    """
    t = tokens(docs, id_col, text_col)
    per_doc = t.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg(F.length("tok")), 6).alias("avg_token_len"),
        F.countDistinct("tok").alias("n_distinct_tokens"),
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.length(text_col).cast("long").alias("n_chars")
    )
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_chars",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("avg_token_len", F.lit(0.0)).alias("avg_token_len"),
        F.coalesce("n_distinct_tokens", F.lit(0)).alias("n_distinct_tokens"),
        F.round(
            F.coalesce(F.col("n_distinct_tokens") / F.col("n_tokens"), F.lit(0.0)), 6
        ).alias("distinct_ratio"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality in [0, 1]: length band + type/token diversity
    + mean-token-length band.  The shape of C4/Gopher-style rule
    filters, arithmetic only."""
    s = text_stats(docs, id_col, text_col)
    len_ok = (F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000)
    tok_len_ok = (F.col("avg_token_len") >= 2.0) & (F.col("avg_token_len") <= 12.0)
    diversity = F.least(F.col("distinct_ratio") * 2, F.lit(1.0))
    return s.select(
        "doc_id",
        F.round(
            (len_ok.cast("double") + tok_len_ok.cast("double") + diversity) / 3.0, 6
        ).alias("quality"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(doc_id, pred_lang, score)`` — argmax of per-language
    stopword-hit counts, ties broken by language code order.  One
    explode + one aggregate; the classic cheap lang-id heuristic."""
    t = tokens(docs, id_col, text_col)
    scores = t.groupBy("doc_id").agg(
        *[
            F.sum(F.col("tok").isin(*words).cast("int")).alias(f"score_{lang}")
            for lang, words in LANG_STOPWORDS.items()
        ]
    )
    # argmax via greatest + chained when (deterministic tie order)
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = None
    for lang in langs:
        cond = F.col(f"score_{lang}") == best
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return scores.select("doc_id", pred.alias("pred_lang"), best.alias("score"))


def fingerprint(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    keep: int = 4,
) -> DataFrame:
    """Winnowing-style document fingerprint: the ``keep`` smallest
    32-bit hashes of the document's character k-grams, concatenated.
    Robust to small edits (unlike the exact md5 fingerprint)."""
    from .dedup import _hash32, char_shingles

    sh = char_shingles(docs, k, id_col, text_col)
    hashed = sh.select("doc_id", _hash32(F.col("sh")).alias("h"))
    return hashed.groupBy("doc_id").agg(
        F.concat_ws(
            "-",
            *[
                F.element_at(F.array_sort(F.collect_set("h")), i + 1).cast("string")
                for i in range(keep)
            ],
        ).alias("fingerprint")
    )


#: GPT-2-ish pre-tokenizer shape: letter runs, digit runs, single
#: punctuation marks.  Kept to a class-only regex so Java (Spark) and
#: RE2-style (DuckDB) engines match byte-for-byte.
BPE_PIECE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, n_pieces, n_distinct_pieces)`` — token counting with
    a BPE-style pre-tokenizer regex (the cost model for LLM training
    data), all JVM-side (``regexp_extract_all``)."""
    # column API, not F.expr: a SQL string literal would eat the \s
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PIECE_RE), F.lit(0))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(pieces).cast("long").alias("n_pieces"),
        F.size(F.array_distinct(pieces)).cast("long").alias("n_distinct_pieces"),
    )


def tfidf_weights(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, term, tf, df, tfidf_micro)`` — classic TF-IDF over
    whitespace terms: ``tf · ln(N / df)``, quantized to integer micros
    (one rounding of one product — engine-portable like the
    Adamic–Adar scores).

    Two map-side-combined aggregates (term frequency per doc, document
    frequency per term) + one join keyed on the term; the corpus-size
    scalar ``N`` is a literal, not a broadcast state."""
    t = tokens(docs, id_col, text_col)
    n_docs = docs.select(id_col).distinct().count()
    tf = t.groupBy("doc_id", F.col("tok").alias("term")).agg(
        F.count("*").cast("long").alias("tf")
    )
    df = (
        t.select("doc_id", F.col("tok").alias("term"))
        .distinct()
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
    )
    return tf.join(df, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(
            F.lit(1_000_000.0)
            * F.col("tf")
            * F.log(F.lit(float(n_docs)) / F.col("df"))
        )
        .cast("long")
        .alias("tfidf_micro"),
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, n_hits, score_micro)`` — Okapi BM25 of each document
    against a bag of query terms; only documents hitting ≥1 term
    appear.  ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` (the
    positive-idf variant), per-term contributions quantized to micros
    before the order-independent integer sum.

    The retrieval-scoring shape: tiny query relation broadcast against
    the per-doc term index; length normalization rides on a per-doc
    token count."""
    t = tokens(docs, id_col, text_col)
    n_docs = docs.select(id_col).distinct().count()
    lens = t.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    avgdl = t.count() / n_docs
    spark = docs.sparkSession
    q = spark.createDataFrame([(w,) for w in query_terms], "term string")
    tf = (
        t.join(F.broadcast(q), t.tok == q.term)
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df = (
        t.select("doc_id", "tok").distinct().join(F.broadcast(q), t.tok == q.term)
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(float(avgdl))
    )
    contrib = F.round(
        F.lit(1_000_000.0) * idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom
    ).cast("long")
    return (
        tf.join(df, "term")
        .join(lens, "doc_id")
        .select("doc_id", "term", contrib.alias("c"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_hits"),
            F.sum("c").cast("long").alias("score_micro"),
        )
    )


def bigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, n_bigrams, sum_logp_micro)`` — corpus bigram
    language-model score per document: train add-one-smoothed bigram
    counts on the whole corpus (the repo's whitespace token
    convention), then score each document by the sum of
    ``ln((c(w1,w2) + 1) / (ctx(w1) + V))`` over its bigrams — the
    perplexity-proxy quality filter of LLM data pipelines (docs whose
    word transitions are unusual for the corpus score low).

    Cross-engine float discipline: each bigram's log-probability is
    quantized to integer micros (one rounding of one ``ln``) and
    summed exactly — the Adamic–Adar/TF-IDF pattern.

    Scale shape: token fan-out is array-side (``transform`` over the
    split array — no self-join for adjacency); the model is two
    map-side-combined aggregates (bigram counts, context counts)
    joined back on the bigram key.  Nothing is collected; ``V`` is the
    only scalar.
    """
    a = docs.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("a")
    )
    bg = a.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(a, 1, size(a) - 1),"
                " (w, i) -> struct(w as w1, a[i + 1] as w2))"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    vocab = (
        a.select(F.explode("a").alias("w")).select("w").distinct().count()
    )
    cbg = bg.groupBy("w1", "w2").agg(F.count("*").alias("cbg"))
    cctx = bg.groupBy("w1").agg(F.count("*").alias("cctx"))
    scored = (
        bg.join(cbg, ["w1", "w2"])
        .join(cctx, "w1")
        .select(
            "doc_id",
            F.round(
                F.lit(1_000_000.0)
                * F.log((F.col("cbg") + 1) / (F.col("cctx") + F.lit(vocab)))
            )
            .cast("long")
            .alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("lp").cast("long").alias("sum_logp_micro"),
    )


def fingerprint_overlap_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    keep: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """``(a_id, b_id, shared)`` — document pairs whose winnowing
    fingerprint sets (the ``keep`` smallest k-gram hashes of
    :func:`fingerprint`) share at least ``min_shared`` values.

    This is the pairing step winnowing exists for (Schleimer et al.,
    "Winnowing: local algorithms for document fingerprinting",
    SIGMOD'03): an inverted-index equi-join on the fingerprint hash —
    each doc contributes ``keep`` rows, candidate pairs only form
    inside a shared hash bucket, never all-pairs.  At 100 TB a hash
    shared by h docs fans out h² pair rows, so hot buckets (boilerplate
    shingles) cap or salt exactly like the rare-ngram blocking in
    ``dedup.ngram_jaccard``."""
    from .dedup import _hash32, char_shingles

    sh = char_shingles(docs, k, id_col, text_col)
    hashed = sh.select("doc_id", _hash32(F.col("sh")).alias("h")).distinct()
    w = Window.partitionBy("doc_id").orderBy("h")
    top = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= keep)
        .select("doc_id", "h")
        .localCheckpoint()
    )
    a = top.alias("a")
    b = top.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .agg(F.count("*").cast("long").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


#: the eight Gopher "stop words" — rule 7 requires at least two of
#: these to be present (Rae et al. 2021, Appendix A1.1)
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry: dict[str, "F.Column"] | None = None,
) -> DataFrame:
    """Gopher quality-rule filter (Rae et al. 2021, *Scaling Language
    Models*, Appendix A1.1) — the standard pre-training heuristic
    gate, computed faithfully per document:

    1. 50 ≤ word count ≤ 100,000
    2. 3 ≤ mean word length ≤ 10
    3. symbol-to-word ratio (``#`` and ``...``) ≤ 0.1
    4. < 90% of lines start with a bullet (``•`` or ``- ``)
    5. < 30% of lines end with an ellipsis
    6. ≥ 80% of words contain at least one alphabetic character
    7. ≥ 2 distinct Gopher stop words present

    All seven rules are JVM-side higher-order-function arithmetic on
    the split word/line arrays — one narrow projection, no explode, no
    shuffle, no Python.  At 100 TB this is a map-only stage that
    pipelines into whatever scan feeds it.

    Returns ``(doc_id, n_words, mean_word_len, symbol_word_ratio,
    bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
    n_stop_present, gopher_pass)``; ratios rounded to 6 decimals, the
    pass flag is BIGINT 0/1 over the conjunction.

    Words are split on runs of ANY whitespace (``\\s+``, the paper's
    convention) so tokens never glue across newlines; lines split on
    ``\\n``.  ``carry`` appends extra named expressions (e.g. a content
    fingerprint) to the SAME projection — the stateless way for a
    streaming caller to keep derived columns without a stream-stream
    self-join.
    """
    w = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    lines = F.split(F.col(text_col), "\n")
    n_words = F.size(w).cast("long")
    n_lines = F.size(lines).cast("long")
    sum_word_len = F.aggregate(
        w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    mean_word_len = F.round(sum_word_len / F.nullif(n_words, F.lit(0)), 6)
    txt = F.col(text_col)
    n_hash = F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(txt) - F.length(F.replace(txt, F.lit("..."), F.lit("")))
    ) / 3
    symbol_ratio = F.round(
        (n_hash + n_ellipsis) / F.nullif(n_words, F.lit(0)), 6
    )
    bullet_frac = F.round(
        F.size(
            F.filter(
                lines, lambda x: x.startswith("•") | x.startswith("- ")
            )
        )
        / n_lines,
        6,
    )
    ellipsis_frac = F.round(
        F.size(F.filter(lines, lambda x: x.endswith("..."))) / n_lines, 6
    )
    alpha_frac = F.round(
        F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]")))
        / F.nullif(n_words, F.lit(0)),
        6,
    )
    n_stop = sum(
        F.array_contains(w, s).cast("long") for s in GOPHER_STOPWORDS
    )
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        F.coalesce(mean_word_len, F.lit(0.0)).alias("mean_word_len"),
        F.coalesce(symbol_ratio, F.lit(0.0)).alias("symbol_word_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        F.coalesce(alpha_frac, F.lit(0.0)).alias("alpha_word_frac"),
        n_stop.alias("n_stop_present"),
        *[expr.alias(name) for name, expr in (carry or {}).items()],
    )
    rules = [
        F.col("n_words").between(50, 100000),
        F.col("mean_word_len").between(3.0, 10.0),
        F.col("symbol_word_ratio") <= 0.1,
        F.col("bullet_line_frac") < 0.9,
        F.col("ellipsis_line_frac") < 0.3,
        F.col("alpha_word_frac") >= 0.8,
        F.col("n_stop_present") >= 2,
    ]
    n_passed = sum(r.cast("long") for r in rules)
    return out.withColumn("n_rules_passed", n_passed).withColumn(
        "gopher_pass", (n_passed == len(rules)).cast("long")
    )


#: Gopher repetition thresholds (Rae et al. 2021, Table A1):
#: (column, max allowed fraction)
GOPHER_REPETITION_RULES: tuple[tuple[str, float], ...] = (
    ("dup_line_frac", 0.30),
    ("dup_line_char_frac", 0.20),
    ("top2gram_char_frac", 0.20),
    ("top3gram_char_frac", 0.18),
    ("top4gram_char_frac", 0.16),
)


def gopher_repetition(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher repetition-rule filter (Rae et al. 2021, Appendix A1.2)
    — the within-document repetition signals that complement the
    A1.1 quality gate (:func:`gopher_quality`):

    * ``dup_line_frac`` — fraction of line occurrences beyond the
      first of each distinct line, ``(n_lines - n_distinct)/n_lines``
      (≤ 0.30);
    * ``dup_line_char_frac`` — fraction of line characters belonging
      to lines that occur more than once, all occurrences counted
      (≤ 0.20);
    * ``top{2,3,4}gram_char_frac`` — fraction of the document's
      characters covered by its single most frequent word {2,3,4}-gram
      (occurrences × gram length / document length; ≤ 0.20/0.18/0.16).
      Ties on occurrence count break to the larger coverage — the
      fraction is identical either way, so the tie-break never shows.
      Overlapping occurrences each count (the public-reimplementation
      convention), so a degenerate "x y x y ..." document can exceed
      1.0 — which fails the ≤-threshold rule exactly as intended.

    (The paper's duplicate-PARAGRAPH rules are the same computation
    over a ``\n\n`` split and the 5-10-gram *all-duplicate* coverage
    rules need overlap-deduplication; both are omitted here and
    documented — the five rules above are the discriminative subset on
    single-paragraph corpora.)

    Scale shape: repetition counting is per-document, so everything is
    a map-side-combined ``groupBy(doc_id, token)`` count followed by a
    per-document max/sum — three n-gram passes and one line pass, each
    one shuffle on (doc_id, token), no window over the corpus and no
    O(len²) per-row loops (a 100k-word document costs its token count,
    not its square).  Words split on whitespace runs, the
    :func:`gopher_quality` convention.

    Returns ``(doc_id, dup_line_frac, dup_line_char_frac,
    top2gram_char_frac, top3gram_char_frac, top4gram_char_frac,
    n_rep_rules_passed, repetition_pass)``; fractions rounded to 6
    decimals; documents shorter than n words score 0 for that n-gram
    rule (nothing repeats).
    """
    d = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    # duplicate-line fractions: one (doc_id, line) count
    lines = d.select("doc_id", F.explode(F.split("text", "\n")).alias("ln"))
    lc = lines.groupBy("doc_id", "ln").agg(F.count("*").alias("c"))
    ld = lc.groupBy("doc_id").agg(
        F.round(
            (F.sum("c") - F.count("*")) / F.sum("c"), 6
        ).alias("dup_line_frac"),
        F.round(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("c") > 1, F.col("c") * F.length("ln")
                    ).otherwise(F.lit(0))
                )
                / F.nullif(F.sum(F.col("c") * F.length("ln")), F.lit(0)),
                F.lit(0.0),
            ),
            6,
        ).alias("dup_line_char_frac"),
    )

    # densest word n-gram coverage: explode -> count -> per-doc max
    w = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")

    def _grams(n: int) -> "F.Column":
        wcol = w

        def _mk(i):  # factory, not default-arg (HOF lambda arity)
            return F.concat_ws(" ", F.slice(wcol, i, n))

        return F.when(
            F.size(wcol) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(wcol) - (n - 1)), lambda i: _mk(i)
            ),
        ).otherwise(F.array().cast("array<string>"))

    tops = []
    for n in (2, 3, 4):
        g = d.select("doc_id", F.explode(_grams(n)).alias("g"))
        cnt = g.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        top = (
            cnt.groupBy("doc_id")
            .agg(
                F.max(
                    F.struct(
                        F.col("c"),
                        (F.col("c") * F.length("g")).alias("cov"),
                    )
                ).alias("t")
            )
            .select("doc_id", F.col("t.cov").alias(f"_cov{n}"))
        )
        tops.append(top)

    out = d.select("doc_id", F.length("text").alias("_chars")).join(
        ld, "doc_id", "left"
    )
    for top in tops:
        out = out.join(top, "doc_id", "left")
    for n in (2, 3, 4):
        out = out.withColumn(
            f"top{n}gram_char_frac",
            F.round(
                F.coalesce(
                    F.col(f"_cov{n}") / F.nullif(F.col("_chars"), F.lit(0)),
                    F.lit(0.0),
                ),
                6,
            ),
        )
    rules = [
        F.col(col) <= F.lit(thr) for col, thr in GOPHER_REPETITION_RULES
    ]
    n_passed = sum(r.cast("long") for r in rules)
    return out.select(
        "doc_id",
        "dup_line_frac",
        "dup_line_char_frac",
        "top2gram_char_frac",
        "top3gram_char_frac",
        "top4gram_char_frac",
        n_passed.alias("n_rep_rules_passed"),
        (n_passed == len(rules)).cast("long").alias("repetition_pass"),
    )


def token_freq_spectrum(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(freq, n_types, gt_adjusted_micro)`` — the corpus frequency
    spectrum (count of counts): for each occurrence count ``r``, how
    many distinct token types occur exactly ``r`` times, plus the
    Good–Turing adjusted count ``r* = (r+1)·n_{r+1}/n_r`` in integer
    micros (NULL where ``n_{r+1}`` is empty — the spectrum tail).
    This is the input to Good–Turing / Simple Good–Turing smoothing
    and the standard corpus-health diagnostic (a natural corpus shows
    a smooth Zipfian spectrum; boilerplate floods single frequencies).

    Cross-engine float discipline: ``(r+1)·n_{r+1}`` stays an exact
    BIGINT product, and the only float op is one division quantized
    to micros — the bigram-LM pattern.

    Scale shape: two map-side-combined aggregations (token counts,
    then count-of-counts) and a self-join of the ~hundreds-row
    spectrum on ``freq+1`` — nothing after the first groupBy is
    proportional to corpus size.
    """
    counts = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("r"))
    )
    spec = counts.groupBy(F.col("r").alias("freq")).agg(
        F.count("*").cast("long").alias("n_types")
    )
    nxt = spec.select(
        (F.col("freq") - 1).alias("freq"), F.col("n_types").alias("n_next")
    )
    return (
        spec.join(nxt, "freq", "left")
        .select(
            "freq",
            "n_types",
            F.round(
                F.lit(1_000_000.0)
                * ((F.col("freq") + 1) * F.col("n_next"))
                * F.lit(1.0)
                / F.col("n_types")
            )
            .cast("long")
            .alias("gt_adjusted_micro"),
        )
    )


def tokenizer_fertility(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-language tokenizer fertility — ``(lang, n_docs, n_chars,
    n_words, n_pieces, chars_per_piece, pieces_per_word)``.

    Fertility (pieces per word) and compression (chars per piece) are
    the standard per-language tokenizer-efficiency metrics for
    multilingual training budgets: a language whose text fragments
    into many pieces per word pays proportionally more sequence
    length for the same content, which shifts both its effective
    sampling weight and its training cost.  Uses the same BPE-style
    pre-tokenizer regex as :func:`bpe_token_counts` (the registry's
    token cost model) and whitespace words.

    One map-side projection computing three integers per doc, one
    grouped sum over |languages| keys, two rounded divisions — scan-
    bounded, no joins, no windows.
    """
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PIECE_RE), F.lit(0))
    words = F.expr(f"size(filter(split({text_col}, ' '), t -> t <> ''))")
    per_doc = docs.select(
        F.col(lang_col).alias("lang"),
        F.length(text_col).cast("long").alias("chars"),
        words.cast("long").alias("words"),
        F.size(pieces).cast("long").alias("pieces"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("chars").cast("long").alias("n_chars"),
            F.sum("words").cast("long").alias("n_words"),
            F.sum("pieces").cast("long").alias("n_pieces"),
        )
        .select(
            "lang",
            "n_docs",
            "n_chars",
            "n_words",
            "n_pieces",
            # null-safe ratios: a language whose docs are all
            # whitespace/empty has n_pieces or n_words == 0 — emit NULL
            # (mirrored as CASE WHEN in the registered oracle; DuckDB's
            # IEEE default would otherwise yield inf and break parity)
            F.when(
                F.col("n_pieces") > 0,
                F.round(F.col("n_chars") / F.col("n_pieces"), 6),
            ).alias("chars_per_piece"),
            F.when(
                F.col("n_words") > 0,
                F.round(F.col("n_pieces") / F.col("n_words"), 6),
            ).alias("pieces_per_word"),
        )
    )


def source_unigram_kl(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source corpus-drift report — ``(source, n_tokens, n_types,
    kl_micro)`` where ``kl_micro`` is the KL divergence
    ``KL(P_source || P_corpus)`` over word unigrams, in integer
    micronats.

    The domain-mixing diagnostic of multi-source training corpora: a
    source whose unigram distribution sits far from the mixture is
    either a distinct domain (weight it deliberately) or contaminated
    (investigate).  KL is computed term-by-term as
    ``(c_sw/N_s)·ln((c_sw/N_s)/(C_w/N))``, each term quantized to
    integer micros with ONE rounding of ONE ``ln`` and summed exactly
    — the cross-engine float discipline of `bigram_lm_scores`.

    Scale shape: two map-side-combined aggregates (per-(source, word)
    and per-word counts) and one join on the word key; per-source
    totals are broadcast, and the corpus total is the only collected
    scalar.  No windows, nothing quadratic.
    """
    w = docs.select(
        F.col(source_col).alias("source"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    sw = w.groupBy("source", "word").agg(F.count("*").alias("c"))
    sw = sw.localCheckpoint()  # feeds three aggregates below
    per_source = sw.groupBy("source").agg(
        F.sum("c").alias("ns"), F.count("*").cast("long").alias("n_types")
    )
    per_word = sw.groupBy("word").agg(F.sum("c").alias("cq"))
    n = sw.agg(F.sum("c")).collect()[0][0]  # bounded scalar
    if n is None:  # empty corpus: SUM over zero rows is NULL
        schema = "source string, n_tokens long, n_types long, kl_micro long"
        return docs.sparkSession.createDataFrame([], schema)
    term = (
        F.round(
            F.lit(1_000_000.0)
            * (F.col("c") / F.col("ns"))
            * F.log((F.col("c") / F.col("ns")) / (F.col("cq") / F.lit(float(n))))
        )
        .cast("long")
        .alias("t")
    )
    return (
        sw.join(F.broadcast(per_source), "source")
        .join(per_word, "word")
        .select("source", "ns", "n_types", term)
        .groupBy("source", "ns", "n_types")
        .agg(F.sum("t").cast("long").alias("kl_micro"))
        .select(
            "source",
            F.col("ns").cast("long").alias("n_tokens"),
            "n_types",
            "kl_micro",
        )
    )
