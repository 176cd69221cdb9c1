"""Text-analysis operators over a ``documents(doc_id, text, ...)`` table:
language-ID, quality scoring, token counting, fingerprinting.

All per-document columns are JVM-side builtins (whole-stage codegen) —
narrow transformations, no shuffle until the final aggregate.  Ratios
are double divisions of exact integers, so the DuckDB oracle reproduces
them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    bpe_token_estimate,
    fingerprint,
    lang_id,
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
    """
    toks = tokens(text_col)
    text = F.col(text_col)
    n_chars = F.length(text)
    alpha_chars = F.length(F.regexp_replace(F.lower(text), "[^a-z0-9]", ""))
    punct_chars = F.length(
        F.regexp_replace(text, "[^!-/:-@\\[-`{-~]", "")
    )
    n_tokens = F.size(toks)
    sw_en = stopword_hits(toks, "en")
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
    return docs.select(
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
        lang_id(toks).alias("pred_lang"),
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

    Scale shape: ONE explode emits every token/2/3/5-gram tagged with
    its size; ONE (doc_id, n, gram) hash aggregate counts occurrences
    (map-side partials absorb the repetition that the metric is
    hunting — a highly repetitive doc combines to few rows before the
    shuffle); ONE (doc_id) rollup derives all six metrics with
    conditional aggregates.  Two shuffles total, both keyed by doc-
    prefixed near-uniform keys; no Python, no window, no self-join.
    """
    toks = tokens(text_col)

    def _tagged(n: int) -> F.Column:
        src = toks if n == 1 else shingles_of(toks, n)
        return F.transform(
            src,
            lambda g: F.struct(
                F.lit(n).alias("n"), g.alias("gram")
            ),
        )

    exploded = docs.select(
        "doc_id",
        F.explode(
            F.concat(_tagged(1), _tagged(2), _tagged(3), _tagged(5))
        ).alias("g"),
    ).select("doc_id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))

    counts = exploded.groupBy("doc_id", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )

    def _when_n(n: int, col: F.Column) -> F.Column:
        return F.when(F.col("n") == n, col)

    gram_chars = F.length("gram") * F.col("cnt")
    per_doc = counts.groupBy("doc_id").agg(
        F.sum(_when_n(1, F.col("cnt"))).cast("long").alias("n_tokens"),
        F.count(_when_n(1, F.lit(1))).cast("long").alias("n_distinct_tokens"),
        F.max(_when_n(2, F.col("cnt"))).cast("long").alias("_top2"),
        F.sum(_when_n(2, F.col("cnt"))).cast("long").alias("_tot2"),
        F.max(_when_n(3, F.col("cnt"))).cast("long").alias("_top3"),
        F.sum(_when_n(3, F.col("cnt"))).cast("long").alias("_tot3"),
        F.sum(
            F.when((F.col("n") == 5) & (F.col("cnt") > 1), gram_chars)
        ).cast("long").alias("_dup5chars"),
        F.sum(_when_n(5, gram_chars)).cast("long").alias("_tot5chars"),
    )

    def _frac(num: F.Column, den: F.Column) -> F.Column:
        return F.when(
            den > 0, num.cast("double") / den.cast("double")
        ).otherwise(F.lit(0.0))

    dup_token = _frac(
        F.col("n_tokens") - F.col("n_distinct_tokens"), F.col("n_tokens")
    )
    top2 = _frac(F.col("_top2"), F.col("_tot2"))
    top3 = _frac(F.col("_top3"), F.col("_tot3"))
    dup5 = _frac(F.coalesce(F.col("_dup5chars"), F.lit(0)), F.col("_tot5chars"))
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        dup_token.alias("dup_token_frac"),
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
