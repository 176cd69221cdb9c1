"""Text-analysis operators over a ``documents(doc_id, text, ...)`` table:
language-ID, quality scoring, token counting, fingerprinting.

All per-document columns are JVM-side builtins (whole-stage codegen) —
narrow transformations, no shuffle until the final aggregate.  Ratios
are double divisions of exact integers, so the DuckDB oracle reproduces
them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import (
    LANG_ORDER,
    bpe_token_estimate,
    fingerprint,
    lang_id_from_hits,
    shingles as shingles_of,
    stopword_hits,
    token_count,
    tokens,
)


def doc_profile(
    docs: DataFrame,
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document analysis columns.

    Output: doc_id, *carry_cols, n_chars_actual, n_tokens, n_bpe_tokens,
    alpha_chars, punct_chars, stopword_hits_en, stopword_ratio,
    punct_ratio, avg_token_len, pred_lang, fingerprint, quality_bucket.

    ``carry_cols`` passes source columns through the projection — callers
    must NOT join the profile back against the input table to recover
    them (that is a full self-join shuffle at scale).

    Staged in three projections so every expensive expression runs
    ONCE per row: the token array sits behind a Generate barrier
    (composed, the regexp split re-ran once per downstream reference —
    the lang-id cascade alone holds ~10), the per-lang stopword counts
    and char-class scans are materialized next, and the final
    projection is pure attribute arithmetic.
    """
    text = F.col(text_col)
    # barrier: tokenize once per doc
    toked = docs.select(
        "doc_id",
        *carry_cols,
        text_col,
        F.explode(F.array(tokens(text_col))).alias("_toks"),
    )
    # materialize every multiply-referenced metric
    staged = toked.select(
        "doc_id",
        *carry_cols,
        text_col,
        F.length(text).alias("_nchars"),
        F.length(
            F.regexp_replace(F.lower(text), "[^a-z0-9]", "")
        ).alias("_alpha"),
        F.length(
            F.regexp_replace(text, "[^!-/:-@\\[-`{-~]", "")
        ).alias("_punct"),
        F.size("_toks").alias("_ntok"),
        *[
            stopword_hits(F.col("_toks"), lang).alias(f"_hit_{lang}")
            for lang in LANG_ORDER
        ],
    )
    n_chars = F.col("_nchars")
    alpha_chars = F.col("_alpha")
    punct_chars = F.col("_punct")
    n_tokens = F.col("_ntok")
    sw_en = F.col("_hit_en")
    stop_ratio = F.when(
        n_tokens > 0, sw_en.cast("double") / n_tokens.cast("double")
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0, punct_chars.cast("double") / n_chars.cast("double")
    ).otherwise(F.lit(0.0))
    avg_tok = F.when(
        n_tokens > 0, alpha_chars.cast("double") / n_tokens.cast("double")
    ).otherwise(F.lit(0.0))
    quality = (
        F.when(n_tokens < 10, F.lit("too_short"))
        .when(punct_ratio > 0.2, F.lit("punct_heavy"))
        .when(stop_ratio < 0.01, F.lit("low_signal"))
        .otherwise(F.lit("ok"))
    )
    return staged.select(
        "doc_id",
        *carry_cols,
        n_chars.alias("n_chars_actual"),
        n_tokens.alias("n_tokens"),
        bpe_token_estimate(text_col).alias("n_bpe_tokens"),
        alpha_chars.alias("alpha_chars"),
        punct_chars.alias("punct_chars"),
        sw_en.alias("stopword_hits_en"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        avg_tok.alias("avg_token_len"),
        lang_id_from_hits(
            {lang: F.col(f"_hit_{lang}") for lang in LANG_ORDER}
        ).alias("pred_lang"),
        fingerprint(text_col).alias("fingerprint"),
        quality.alias("quality_bucket"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    hash every char k-gram of the whitespace-normalized text, slide a
    w-window over the hash sequence, keep each window's minimum.

    Output: doc_id, n_fingerprints, fingerprints (sorted distinct,
    comma-joined).  Docs shorter than k+w-1 normalized chars produce no
    complete window and drop out (same filter in the oracle).

    Scale shape: ZERO exchanges — the whole computation is per-doc
    array math (hash array → sliding-window mins → distinct/sort), so
    it pipelines over the scan with no shuffle, no sort, no aggregate
    state.  Each heavy expression is pinned behind an
    ``explode(array(...))`` Generate (a 1→1 barrier): projection
    collapse would otherwise inline the normalization into the
    per-gram lambda (once per GRAM) and the gram-hash array into the
    per-window lambda (once per WINDOW — quadratic).  No Python, no
    skew (one row per doc end-to-end).
    """
    from ..functions.text import hash32

    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    # barrier 1: normalize once per doc
    base = (
        docs.select("doc_id", F.explode(F.array(norm)).alias("_norm"))
        .filter(F.length("_norm") >= k + w - 1)  # ≥1 complete window
        .select(
            "doc_id",
            "_norm",
            (F.length("_norm") - k + 1).alias("_ng"),  # n. of k-grams
        )
    )
    # barrier 2: hash every k-gram once (array of _ng hashes per doc)
    hashed = base.select(
        "doc_id",
        "_ng",
        F.explode(
            F.array(
                F.transform(
                    F.sequence(F.lit(1), F.col("_ng")),
                    lambda p: hash32(F.col("_norm").substr(p, F.lit(k))),
                )
            )
        ).alias("_hs"),
    )
    # barrier 3: per-window mins over the hash array, distinct + sorted
    mins = hashed.select(
        "doc_id",
        F.explode(
            F.array(
                F.sort_array(
                    F.array_distinct(
                        F.transform(
                            F.sequence(F.lit(1), F.col("_ng") - w + 1),
                            lambda i: F.array_min(
                                F.slice(F.col("_hs"), i, F.lit(w))
                            ),
                        )
                    )
                )
            )
        ).alias("_mins"),
    )
    return mins.select(
        "doc_id",
        F.size("_mins").cast("long").alias("n_fingerprints"),
        F.array_join(
            F.transform(F.col("_mins"), lambda x: x.cast("string")), ","
        ).alias("fingerprints"),
    )


#: Gopher repetition-filter thresholds (Rae et al. 2021, table A1 shape):
#: a doc is flagged repetitive when its most common 2-gram covers more
#: than 20% of all 2-grams, or characters inside duplicated 5-grams
#: cover more than 15% of all 5-gram characters.
TOP_BIGRAM_MAX = 0.20
DUP_5GRAM_CHAR_MAX = 0.15


def repetition_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition / boilerplate metrics per document.

    Output: doc_id, n_tokens, n_distinct_tokens, dup_token_frac,
    top_bigram_frac, top_trigram_frac, dup_5gram_char_frac,
    repetition_flag (1 when a Gopher threshold trips).

    Docs with zero tokens produce no row (the oracle applies the same
    filter).

    Scale shape: ZERO shuffles — all metrics are per-doc array math
    (sort each gram array, then one run-length-encoding pass with an
    ``aggregate`` HOF finds the top run and the duplicated-gram chars),
    so the operator pipelines over the scan, embarrassingly parallel in
    input partitions.  The explode→(doc_id, n, gram) count→rollup
    alternative shuffles ~4× the token count as gram strings and
    measured 2× slower at sf0.1 (17.9 s vs 9.1 s) despite staying in
    whole-stage codegen — the shuffle dominates the interpreted-HOF
    penalty here, the same trade ``winnow_fingerprints`` settled on.
    """
    toks = tokens(text_col)
    base = docs.select("doc_id", toks.alias("_toks")).filter(
        F.size("_toks") > 0
    )

    def _long(n: int) -> F.Column:
        return F.lit(n).cast("long")

    def _top_run(arr: F.Column) -> F.Column:
        """Max run length in a sorted array = max occurrence count."""
        acc0 = F.struct(
            F.lit("").alias("prev"),
            _long(0).alias("run"),
            _long(0).alias("best"),
        )

        def step(a: F.Column, x: F.Column) -> F.Column:
            nrun = F.when(x == a["prev"], a["run"] + 1).otherwise(_long(1))
            return F.struct(
                x.alias("prev"),
                nrun.alias("run"),
                F.greatest(a["best"], nrun).alias("best"),
            )

        return F.aggregate(arr, acc0, step, lambda a: a["best"])

    def _dup_chars(arr: F.Column) -> F.Column:
        """sum(length(gram) * count) over grams with count > 1, from a
        sorted array: the 2nd occurrence retroactively adds the 1st's
        chars, later occurrences add their own."""
        acc0 = F.struct(
            F.lit("").alias("prev"),
            _long(0).alias("run"),
            _long(0).alias("dup"),
        )

        def step(a: F.Column, x: F.Column) -> F.Column:
            same = x == a["prev"]
            add = (
                F.when(same & (a["run"] == 1), F.length(x).cast("long") * 2)
                .when(same, F.length(x).cast("long"))
                .otherwise(_long(0))
            )
            return F.struct(
                x.alias("prev"),
                F.when(same, a["run"] + 1).otherwise(_long(1)).alias("run"),
                (a["dup"] + add).alias("dup"),
            )

        return F.aggregate(arr, acc0, step, lambda a: a["dup"])

    # Build + sort each gram array ONCE behind a Generate barrier:
    # each array feeds two consumers below (run-finder + size), and
    # interpreted HOF expressions get no common-subexpression
    # elimination, so un-barriered they would each evaluate twice.
    grams = base.select(
        "doc_id",
        "_toks",
        F.explode(
            F.array(
                F.struct(
                    F.array_sort(shingles_of(F.col("_toks"), 2)).alias(
                        "g2"
                    ),
                    F.array_sort(shingles_of(F.col("_toks"), 3)).alias(
                        "g3"
                    ),
                    F.array_sort(shingles_of(F.col("_toks"), 5)).alias(
                        "g5"
                    ),
                )
            )
        ).alias("_g"),
    )
    g2, g3, g5 = F.col("_g.g2"), F.col("_g.g3"), F.col("_g.g5")
    stage = grams.select(
        "doc_id",
        F.size("_toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("_toks")).cast("long").alias(
            "n_distinct_tokens"
        ),
        _top_run(g2).alias("_top2"),
        F.size(g2).cast("long").alias("_tot2"),
        _top_run(g3).alias("_top3"),
        F.size(g3).cast("long").alias("_tot3"),
        _dup_chars(g5).alias("_dup5chars"),
        F.aggregate(
            g5, _long(0), lambda a, x: a + F.length(x)
        ).alias("_tot5chars"),
    )

    def _frac(num: F.Column, den: F.Column) -> F.Column:
        return F.when(
            den > 0, num.cast("double") / den.cast("double")
        ).otherwise(F.lit(0.0))

    top2 = _frac(F.col("_top2"), F.col("_tot2"))
    top3 = _frac(F.col("_top3"), F.col("_tot3"))
    dup5 = _frac(F.col("_dup5chars"), F.col("_tot5chars"))
    return stage.select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        _frac(
            F.col("n_tokens") - F.col("n_distinct_tokens"), F.col("n_tokens")
        ).alias("dup_token_frac"),
        top2.alias("top_bigram_frac"),
        top3.alias("top_trigram_frac"),
        dup5.alias("dup_5gram_char_frac"),
        F.when(
            (top2 > TOP_BIGRAM_MAX) | (dup5 > DUP_5GRAM_CHAR_MAX), 1
        ).otherwise(0).cast("int").alias("repetition_flag"),
    )


def corpus_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source corpus rollup over the profile columns."""
    prof = doc_profile(docs, text_col, carry_cols=("source",))
    return prof.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
        F.countDistinct("fingerprint").alias("n_unique_fingerprints"),
        F.sum(
            F.when(F.col("quality_bucket") == "ok", 1).otherwise(0)
        ).alias("n_quality_ok"),
    )


def lang_confusion(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Predicted-vs-labelled language counts (lang-ID evaluation)."""
    prof = doc_profile(docs, text_col, carry_cols=("lang",))
    return prof.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


#: RE2-compatible (and java.util.regex-compatible) PII patterns — the
#: subset of syntax the Spark and DuckDB regex engines agree on
#: (character classes, bounded repetition, \b, \S; no lookaround).
PII_EMAIL_RX = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_URL_RX = r"https?://\S+"
PII_IPV4_RX = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc PII indicator counts (emails, URLs, IPv4 literals) for
    scrub-or-drop decisions; only docs with ≥1 hit produce a row.

    Scale shape: a pure narrow projection (three ``regexp_count`` calls
    + a filter) — pipelines over the scan, zero shuffle.  Redaction
    itself is the same projection with ``regexp_replace``; the counts
    are the audit surface.
    """
    t = F.col(text_col)
    out = docs.select(
        "doc_id",
        F.regexp_count(F.lower(t), F.lit(PII_EMAIL_RX)).cast("int").alias(
            "n_emails"
        ),
        F.regexp_count(t, F.lit(PII_URL_RX)).cast("int").alias("n_urls"),
        F.regexp_count(t, F.lit(PII_IPV4_RX)).cast("int").alias("n_ipv4"),
    )
    return out.filter(
        (F.col("n_emails") + F.col("n_urls") + F.col("n_ipv4")) > 0
    )


#: Exact-percentile points for the length-distribution rollup.
LENGTH_QUANTILES = (0.25, 0.5, 0.75, 0.95)


def length_quantiles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source token-length distribution: n_docs, mean, and exact
    p25/p50/p75/p95 (linear interpolation — Spark ``percentile`` and
    DuckDB ``quantile_cont`` agree bit-for-bit).

    Scale note: exact percentile is a TypedImperativeAggregate whose
    partial state is a value→count map — bounded here because token
    counts are small integers, so partials stay tiny and combine
    map-side.  For unbounded-domain columns the swap-in is
    ``approx_percentile`` (t-digest) at the same call site.  The mean
    is computed as exact long sum / count, not ``avg``, so the result
    does not depend on double accumulation order.
    """
    n = F.size(tokens(text_col)).alias("n_tokens")
    base = docs.select("source", n)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (
            F.sum("n_tokens").cast("double") / F.count(F.lit(1))
        ).alias("mean_tokens"),
    ] + [
        F.percentile("n_tokens", F.lit(q)).alias(f"p{int(q * 100)}")
        for q in LENGTH_QUANTILES
    ]
    return base.groupBy("source").agg(*aggs)


#: Unigram-LM scoring parameters: vocabulary = the VOCAB_SIZE most
#: frequent tokens (ties broken lexicographically); out-of-vocabulary
#: tokens get a fixed floor probability of OOV_NUM / total_tokens.
VOCAB_SIZE = 4096
OOV_NUM = 0.5


def unigram_logprob_scores(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = VOCAB_SIZE,
) -> DataFrame:
    """Per-doc mean unigram log-probability — the cheap stand-in for the
    perplexity filter (CCNet-style) that ranks docs by how typical
    their token distribution is of the corpus; gibberish and OCR noise
    score low.

    Output: doc_id, n_tokens, n_oov, oov_frac, avg_logprob (docs with
    zero tokens produce no row).

    Scale shape: pass 1 is a (token) count aggregate — map-side
    partials collapse repeats, and the result (≤ corpus vocabulary)
    orders by (count DESC, token ASC) to take the top ``vocab_size``
    rows, which then BROADCAST; pass 2 is a narrow broadcast LEFT join
    of exploded tokens against that dictionary plus one per-doc
    rollup.  Log values are decimal-cast before summing so the mean is
    independent of accumulation order (the cross-engine determinism
    rule used throughout this package).
    """
    toks = docs.select(
        "doc_id", F.explode(tokens(text_col)).alias("_t")
    )
    counts = toks.groupBy("_t").agg(F.count(F.lit(1)).alias("_cnt"))
    total = counts.agg(F.sum("_cnt").cast("long").alias("_total"))
    # orderBy + limit compiles to TakeOrderedAndProject: each partition
    # keeps its local top-k and the driver merges k rows — no global
    # single-task sort of the corpus vocabulary (which is 10^8+ rows at
    # full scale).  Tie-break on token keeps the cut deterministic.
    vocab = (
        counts.orderBy(F.col("_cnt").desc(), F.col("_t").asc())
        .limit(vocab_size)
        .select("_t", "_cnt")
    )
    marked = (
        toks.join(F.broadcast(vocab), on="_t", how="left")
        .crossJoin(F.broadcast(total))
    )
    logp = F.log(
        F.coalesce(F.col("_cnt").cast("double"), F.lit(float(OOV_NUM)))
        / F.col("_total").cast("double")
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(
                F.when(F.col("_cnt").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_oov"),
            F.round(
                F.sum(logp.cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_logprob"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            (
                F.col("n_oov").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("oov_frac"),
            "avg_logprob",
        )
    )


#: Default corpus top-n-gram report size.
TOP_NGRAMS_K = 50


def top_ngrams(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 2,
    k: int = TOP_NGRAMS_K,
) -> DataFrame:
    """Corpus-wide most-frequent word n-grams — the boilerplate-discovery
    report that drives template/stopphrase blocklists (the corpus-level
    companion of the per-doc Gopher repetition filter).

    Output: ngram, n_docs, n_occurrences — top ``k`` by occurrence
    count, ties broken by ngram text so the cut is deterministic.

    Scale shape: the per-doc combine happens in ARRAY MATH before any
    exchange — sort the doc's gram array, find run starts, emit one
    (ngram, count) struct per DISTINCT gram — so the single shuffle
    carries per-doc pre-combined pairs, not raw occurrences (the same
    shuffle-avoidance trade ``repetition_profile`` measured 2× faster
    than explode+count), and ``n_docs`` is a plain row count — NO
    count_distinct, so no Expand.  The final cut is ``orderBy().limit()``
    → ``TakeOrderedAndProject``: per-partition top-k, driver merges k
    rows — the corpus n-gram table itself (easily 10^9+ keys at 100 TB)
    is never globally sorted and never single-tasked.  Intermediate
    arrays sit behind ``explode(array(...))`` Generate barriers so
    projection collapse cannot inline the sort into the per-element
    lambdas (the ``winnow_fingerprints`` rule).
    """
    # barrier 0: tokenize once per doc — without this, projection
    # collapse inlines the regexp split into the shingle lambda and the
    # split re-runs once per GRAM (measured 20× the tokenize cost)
    toked = docs.select(
        "doc_id", F.explode(F.array(tokens(text_col))).alias("_t")
    )
    # barrier 1: build + sort the gram array once per doc
    base = toked.select(
        "doc_id",
        F.explode(
            F.array(F.array_sort(shingles_of(F.col("_t"), n)))
        ).alias("_g"),
    ).filter(F.size("_g") >= 1)
    # barrier 2: 1-based run-start positions in the sorted array
    # (position 1, plus every i whose gram differs from its left
    # neighbor; F.get is 0-based and null-safe, and `i == 1` absorbs
    # the null comparison at the left edge)
    starts = F.filter(
        F.sequence(F.lit(1), F.size("_g")),
        lambda i: (i == F.lit(1))
        | (F.get(F.col("_g"), i - 1) != F.get(F.col("_g"), i - 2)),
    )
    pos = base.select(
        "doc_id", "_g", F.explode(F.array(starts)).alias("_pos")
    )
    # one struct per distinct gram: run length = next start - this start
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("_pos")),
        lambda j: F.struct(
            F.get(F.col("_g"), F.get(F.col("_pos"), j - 1) - 1).alias(
                "ngram"
            ),
            (
                F.coalesce(
                    F.get(F.col("_pos"), j), F.size("_g") + 1
                )
                - F.get(F.col("_pos"), j - 1)
            )
            .cast("long")
            .alias("cnt"),
        ),
    )
    per_doc = pos.select(F.explode(pairs).alias("_p")).select(
        F.col("_p.ngram").alias("ngram"), F.col("_p.cnt").alias("cnt")
    )
    return (
        per_doc.groupBy("ngram")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("cnt").cast("long").alias("n_occurrences"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram").asc())
        .limit(k)
    )


def tfidf_top_terms(
    docs: DataFrame, text_col: str = "text", k: int = 5
) -> DataFrame:
    """Top-``k`` TF-IDF terms per source — the per-subcorpus
    signature-vocabulary report (smoothed idf = ln((N+1)/(df+1)) + 1,
    the scikit-learn smoothing).

    Output: source, term, tf (term occurrences in the source), df
    (docs containing the term), score (round 6), rank (1..k; ties
    broken by term asc so both engines rank identically — scores are
    ranked AFTER rounding to keep ulp-level ln() differences across
    engines from flipping adjacent ranks).

    Scale shape: one explode → (term, doc) map-side-combined aggregate
    (the big shuffle, dedup-compressed), a term-keyed df rollup, a
    term equi-join, the corpus size as a broadcast one-row scalar
    (never a driver literal), and a per-source window whose state is
    bounded by k·|sources|.  Nothing driver-side, no global sort.
    """
    from ..functions.text import tokens

    t = docs.select(
        "doc_id", "source", F.explode(tokens(text_col)).alias("term")
    )
    per_doc_term = t.groupBy("term", "doc_id", "source").agg(
        F.count(F.lit(1)).alias("_tf")
    )
    df_counts = per_doc_term.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    src_term = per_doc_term.groupBy("source", "term").agg(
        F.sum("_tf").cast("long").alias("tf")
    )
    scored = (
        src_term.join(df_counts, "term")
        .join(F.broadcast(n_docs))
        .select(
            "source",
            "term",
            "tf",
            F.col("df").cast("long").alias("df"),
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("_n") + F.lit(1.0))
                        / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


#: hash32 yields 7 hex digits -> [0, 2^28); dividing token-hash sums by
#: n·2^27 maps the mean to [0, 2) so score = mean - 1 lies in [-1, 1).
HASH_WEIGHT_SCALE = float(1 << 27)


def quality_classifier_scores(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Hashing-trick linear quality classifier (fasttext-shaped): each
    token maps to a weight through a hash projection, a doc's score is
    the mean weight, and the keep/drop label is the sign.  The weights
    here are hash-DERIVED placeholders (no trained model ships in this
    repo); the distributed scoring machinery — per-token hash lookup,
    exact mean, threshold — is the real deliverable, and a trained
    model drops in by broadcasting its (hash-bucket → weight) table at
    the same spot.

    Output: doc_id, n_tokens, quality_score (round 6), label.

    Determinism: the per-doc aggregation sums the INTEGER token hashes
    (exact, order-free long arithmetic; max corpus-doc sum ≈ 2^41 «
    2^53) and divides once at the end — never a float sum, so both
    engines produce bit-identical scores.  Scale shape: one explode →
    one map-side-combined aggregate; nothing else."""
    from ..functions.text import hash32, tokens

    t = docs.select("doc_id", F.explode(tokens(text_col)).alias("_tok"))
    agg = t.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(hash32(F.col("_tok"))).alias("_hsum"),
    )
    score = F.round(
        F.col("_hsum").cast("double")
        / (F.col("n_tokens") * F.lit(HASH_WEIGHT_SCALE))
        - 1.0,
        6,
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        score.alias("quality_score"),
        F.when(score >= 0, F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("label"),
    )


def hashed_tf_vectors(
    docs: DataFrame, dim: int = 64, text_col: str = "text"
) -> DataFrame:
    """Hashing-trick TF vectorization — the text→embedding bridge: each
    token hashes to one of ``dim`` buckets, a doc's vector is its
    L2-normalized bucket-count histogram.  Output is the SPARSE long
    form (doc_id, bucket, weight round 6) — the honest representation
    at scale (most buckets are zero for short docs) and directly
    SQL-verifiable; ``hashed_tf_dense`` materializes the dense
    ``array<double>`` column for composing with the ANN/embedding
    operators.

    Determinism: counts are exact longs, the squared-norm is an exact
    long sum (order-free), sqrt is IEEE-correctly-rounded in both
    engines, and each weight divides once — no float accumulation
    anywhere.  Scale shape: explode → two stacked map-side-combined
    aggregates → window-free self-join on doc_id for the norm."""
    from ..functions.text import hash32, tokens

    t = docs.select("doc_id", F.explode(tokens(text_col)).alias("_tok"))
    g = t.groupBy(
        "doc_id", F.pmod(hash32(F.col("_tok")), F.lit(dim)).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("_cnt"))
    ss = g.groupBy("doc_id").agg(
        F.sum(F.col("_cnt") * F.col("_cnt")).alias("_ss")
    )
    return g.join(ss, "doc_id").select(
        "doc_id",
        F.col("bucket").cast("int").alias("bucket"),
        F.round(
            F.col("_cnt").cast("double") / F.sqrt(F.col("_ss")), 6
        ).alias("weight"),
    )


def hashed_tf_dense(
    docs: DataFrame, dim: int = 64, text_col: str = "text"
) -> DataFrame:
    """Dense companion of ``hashed_tf_vectors``: (vec_id, embedding
    array<double>) rows ready for the similarity/dedup operators —
    zero-filled buckets, same weights."""
    sparse = hashed_tf_vectors(docs, dim, text_col)
    packed = sparse.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "weight"))
        ).alias("_m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at("_m", i.cast("int")), F.lit(0.0)),
    )
    return packed.select(
        F.col("doc_id").alias("vec_id"), vec.alias("embedding")
    )


def bigram_logprob_scores(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per-doc mean bigram log-probability under a corpus-trained
    add-one-smoothed model — one modeling step past
    ``unigram_logprob_scores``: P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V).
    Word-salad that passes a unigram filter (common words, nonsense
    order) scores low here.  Docs with < 2 tokens drop.

    Output: doc_id, n_bigrams, avg_logprob (round 6).

    Scale shape: bigram pairs derive NARROW — ``zip_with`` of the
    token array against its own 1-shifted slice, then explode — no
    posexplode+window shuffle of the token stream.  The model tables
    are aggregates far smaller than the corpus — bigram counts,
    unigram counts, and the vocabulary size as a broadcast one-row
    scalar; scoring joins each doc's bigram rows against them by key
    (equi-joins, model side hash-partitioned once).  Log values
    decimal-cast before summing, so the mean is accumulation-order
    independent (the package-wide determinism rule)."""
    from ..functions.text import tokens

    arr = docs.select("doc_id", tokens(text_col).alias("_w"))
    toks = arr.select("doc_id", F.explode("_w").alias("_w2"))
    bi = arr.filter(F.size("_w") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(_w, 1, size(_w) - 1), "
                "slice(_w, 2, size(_w) - 1), "
                "(a, b) -> struct(a AS _w1, b AS _w2))"
            )
        ).alias("_bg"),
    ).select("doc_id", F.col("_bg._w1").alias("_w1"), F.col("_bg._w2").alias("_w2"))
    bcnt = bi.groupBy("_w1", "_w2").agg(F.count(F.lit(1)).alias("_cb"))
    ucnt = toks.groupBy("_w2").agg(
        F.count(F.lit(1)).alias("_cu")
    ).select(F.col("_w2").alias("_w1"), "_cu")
    vocab = toks.agg(F.countDistinct("_w2").alias("_v"))
    scored = (
        bi.select("doc_id", "_w1", "_w2")
        .join(bcnt, ["_w1", "_w2"])
        .join(ucnt, "_w1")
        .join(F.broadcast(vocab))
    )
    lp = F.log(
        (F.col("_cb") + 1).cast("double")
        / (F.col("_cu") + F.col("_v")).cast("double")
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(
            F.sum(lp.cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_logprob"),
    )


def sketch_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source approximate-sketch profile — the sketch tier a 100 TB
    profiler runs where exact answers don't fit: HyperLogLog++ distinct
    token estimate (``approx_count_distinct``, rsd 2%) and t-digest
    token-length quantiles (``approx_percentile``, accuracy 1000).

    Both sketches are MERGEABLE — partials combine map-side and across
    partitions/executors in any order, which is what makes them the
    scale path where exact distinct (full shuffle of the key space) and
    exact percentile (value→count map state) stop fitting.  Spark's
    implementations hash with fixed seeds, so results are deterministic
    for a given input, but NOT reproducible by another engine —
    this operator is therefore registered WITHOUT a DuckDB oracle (the
    driver records the weaker rows-only check) and its accuracy is
    gated by a local test against the exact operators instead.

    Output: source, n_docs, approx_distinct_tokens, p50_len, p95_len.
    """
    from ..functions.text import tokens

    t = docs.select(
        "source",
        F.explode(tokens(text_col)).alias("_tok"),
    )
    per_tok = t.groupBy("source").agg(
        F.approx_count_distinct("_tok", rsd=0.02).alias(
            "approx_distinct_tokens"
        )
    )
    lens = docs.select(
        "source", F.size(tokens(text_col)).alias("_n")
    )
    per_len = lens.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("approx_percentile(_n, 0.5D, 1000)").alias("p50_len"),
        F.expr("approx_percentile(_n, 0.95D, 1000)").alias("p95_len"),
    )
    return per_len.join(per_tok, "source").select(
        "source", "n_docs", "approx_distinct_tokens", "p50_len", "p95_len"
    )


def sketch_accuracy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source sketch-accuracy contract as DATA — the driver-checkable
    companion to :func:`sketch_profile`.

    The sketch VALUES are engine-specific (HLL++/t-digest), so they can
    never hash-match another engine; the accuracy CONTRACT can.  This
    query computes both the sketches and the exact answers in one plan
    and emits per-source pass/fail flags:

    - ``hll_within_3rsd``: |HLL estimate − exact distinct| < 3×rsd
      (rsd 2% → 6%) of the exact distinct-token count,
    - ``median_in_iqr``: the t-digest median lies inside the exact
      [p25, p75] band,
    - ``p95_ge_p50``: sketch self-consistency (quantile monotonicity).

    The DuckDB oracle computes the same ``n_docs`` and exact distinct
    counts and asserts the flags as literal 1s — a sketch drifting out
    of tolerance flips a flag to 0 and fails the value-hash compare, so
    the accuracy gate runs inside the driver, not just in local tests.

    Scale: the exact sides are one distinct-aggregate and one exact
    percentile per source — affordable at verification scale (the
    harness runs at sf0.01); at 100 TB you run :func:`sketch_profile`
    alone and this contract query on a sampled slice.
    """
    from ..functions.text import tokens

    sk = sketch_profile(docs, text_col)
    t = docs.select("source", F.explode(tokens(text_col)).alias("_tok"))
    exact_d = t.groupBy("source").agg(
        F.countDistinct("_tok").cast("long").alias("exact_distinct_tokens")
    )
    lens = docs.select("source", F.size(tokens(text_col)).alias("_n"))
    exact_q = lens.groupBy("source").agg(
        F.percentile("_n", F.lit(0.25)).alias("_p25"),
        F.percentile("_n", F.lit(0.75)).alias("_p75"),
    )
    return (
        sk.join(exact_d, "source")
        .join(exact_q, "source")
        .select(
            "source",
            "n_docs",
            "exact_distinct_tokens",
            (
                F.abs(
                    F.col("approx_distinct_tokens")
                    - F.col("exact_distinct_tokens")
                ).cast("double")
                < F.lit(0.06) * F.col("exact_distinct_tokens").cast("double")
            )
            .cast("int")
            .alias("hll_within_3rsd"),
            (
                (F.col("_p25") <= F.col("p50_len"))
                & (F.col("p50_len") <= F.col("_p75"))
            )
            .cast("int")
            .alias("median_in_iqr"),
            (F.col("p95_len") >= F.col("p50_len"))
            .cast("int")
            .alias("p95_ge_p50"),
        )
    )


#: Spectrum head cut: frequency-of-frequencies reported for
#: occurrence counts up to this value (the corpus-health band —
#: hapax/doubleton mass reacts first to duplication and boilerplate).
ZIPF_MAX_F = 50


def zipf_spectrum(
    docs: DataFrame, text_col: str = "text", max_f: int = ZIPF_MAX_F
) -> DataFrame:
    """Token frequency-of-frequencies (the head of the Zipf spectrum).

    For each occurrence count ``f <= max_f``: how many vocabulary types
    occur exactly ``f`` times, and what fraction of the vocabulary that
    is.  A healthy natural corpus keeps roughly half its vocabulary as
    hapax legomena; duplicated or boilerplate-heavy corpora show the
    hapax fraction collapsing toward the high-f tail — a one-row-per-f
    diagnostic that moves BEFORE dedup operators get expensive.

    Scale: two stacked hash aggregates, both map-side combined (token →
    count, then count → types); the second's key space after the
    ``max_f`` cut is ≤ ``max_f`` rows, and the vocabulary size joins in
    as a broadcast one-row scalar.  Nothing is globally sorted.

    Output: f, n_tokens (vocab types at that f), vocab_frac (round 6).
    """
    from ..functions.text import tokens

    tf = (
        docs.select(F.explode(tokens(text_col)).alias("_t"))
        .groupBy("_t")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    vocab = tf.agg(F.count(F.lit(1)).alias("_v"))
    return (
        tf.filter(F.col("f") <= max_f)
        .groupBy("f")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"))
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col("f").cast("long").alias("f"),
            "n_tokens",
            F.round(
                F.col("n_tokens").cast("double")
                / F.col("_v").cast("double"),
                6,
            ).alias("vocab_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Count-Min Sketch frequency estimation (measured error contract)
# ---------------------------------------------------------------------------

#: CMS shape: depth independent hash rows × width counters.  State is
#: depth*width longs TOTAL regardless of corpus size — the
#: bounded-memory path for token frequencies at 100 TB, where the
#: exact per-token table is itself billions of rows.  Width is sized
#: to the FIXTURE vocabulary (~31 distinct tokens) so hash collisions
#: actually occur and the measured overestimate is non-trivial; a real
#: deployment sizes width to its memory budget (e.g. 2^20).
CMS_DEPTH = 4
CMS_WIDTH = 16

#: Heavy-hitter report size for the registered query.
CMS_TOPK = 50


def cms_heavy_hitters(
    docs: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    k: int = CMS_TOPK,
    text_col: str = "text",
) -> DataFrame:
    """Count-Min Sketch token-frequency estimation with its measured
    error, per heavy hitter: build the depth×width counter table, then
    report — for the exact top-k tokens — the true count, the CMS
    estimate (min over rows), and the overestimate.  ``est >= true``
    always (one-sided guarantee); the overestimate column is the
    MEASURED collision error the depth/width choice buys on this
    corpus, the same estimate-vs-truth contract the ANN recall and
    MinHash calibration harnesses use.

    Unlike randomized sketches, the hash rows are salted md5 — fully
    deterministic — so the whole report is hash-exact reproducible by
    the DuckDB oracle (no weaker rows-only check needed).

    Scale shape (100 TB): ONE corpus pass.  The per-token count table
    — needed anyway for the exact side — is materialized (it is the
    reduced table: bounded by the corpus vocabulary, not the token
    stream) and BOTH branches derive from it: counters as a
    distinct-vocab × ``depth`` Generate weighted by the counts
    (map-side partials collapse to ≤ depth*width rows), candidates as
    a TakeOrderedAndProject k-cut; estimates come from joining the k
    candidates against the BROADCAST counter table.  Nothing
    corpus-sized moves past the aggregates.

    Output: token, true_cnt, est_cnt, overestimate (k rows).
    """
    from ..functions.text import hash32, tokens
    from ..session import materialize

    tk = docs.select(F.explode(tokens(text_col)).alias("_t"))

    def _bucket(tok_col) -> F.Column:
        return F.array(
            *[
                F.struct(
                    F.lit(d).cast("long").alias("d"),
                    F.pmod(
                        hash32(F.concat(F.lit(f"cms{d}#"), tok_col)),
                        F.lit(width),
                    ).alias("bucket"),
                )
                for d in range(depth)
            ]
        )

    cnt = materialize(
        tk.groupBy("_t").agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
    )
    counters = (
        cnt.select(F.explode(_bucket(F.col("_t"))).alias("_db"), "true_cnt")
        .groupBy("_db.d", "_db.bucket")
        .agg(F.sum("true_cnt").cast("long").alias("c"))
    )
    candidates = cnt.orderBy(
        F.col("true_cnt").desc(), F.col("_t").asc()
    ).limit(k)
    probes = candidates.select(
        "_t", "true_cnt", F.explode(_bucket(F.col("_t"))).alias("_db")
    )
    return (
        probes.join(
            F.broadcast(counters),
            (probes["_db.d"] == counters["d"])
            & (probes["_db.bucket"] == counters["bucket"]),
        )
        .groupBy("_t", "true_cnt")
        .agg(F.min("c").cast("long").alias("est_cnt"))
        .select(
            F.col("_t").alias("token"),
            "true_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("true_cnt"))
            .cast("long")
            .alias("overestimate"),
        )
    )
