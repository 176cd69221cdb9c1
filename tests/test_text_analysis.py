"""Semantic tests for the Gopher-style repetition profile (the driver
oracle pins Spark-vs-DuckDB parity; these pin the metric definitions
against hand-computed values on adversarial docs)."""

from __future__ import annotations

import pytest

from evmtrace_etl_spark.operators import text_analysis


@pytest.fixture(scope="module")
def rep_rows(spark):
    docs = spark.createDataFrame(
        [
            # 8 tokens, all "spam": top bigram covers 7/7 2-grams,
            # the single 5-gram is duplicated 4× → both flags trip
            (1, "spam spam spam spam spam spam spam spam"),
            # natural text, no repeated bigram
            (2, "the quick brown fox jumps over a lazy dog"),
            # punctuation only → zero tokens → no output row
            (3, "!!! ... ???"),
            # empty text → no output row
            (4, ""),
        ],
        "doc_id int, text string",
    )
    out = text_analysis.repetition_profile(docs)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_zero_token_docs_emit_no_row(rep_rows):
    assert set(rep_rows) == {1, 2}


def test_repetitive_doc_metrics(rep_rows):
    r = rep_rows[1]
    assert r["n_tokens"] == 8
    assert r["n_distinct_tokens"] == 1
    assert r["dup_token_frac"] == pytest.approx(7 / 8)
    assert r["top_bigram_frac"] == pytest.approx(1.0)
    assert r["top_trigram_frac"] == pytest.approx(1.0)
    # all four 5-grams are the same string → every 5-gram char is
    # inside a duplicated 5-gram
    assert r["dup_5gram_char_frac"] == pytest.approx(1.0)
    assert r["repetition_flag"] == 1


def test_natural_doc_not_flagged(rep_rows):
    r = rep_rows[2]
    assert r["n_tokens"] == 9
    assert r["n_distinct_tokens"] == 9
    assert r["dup_token_frac"] == 0.0
    # 8 distinct bigrams, each once → top fraction 1/8
    assert r["top_bigram_frac"] == pytest.approx(1 / 8)
    # 5 distinct 5-grams, none duplicated
    assert r["dup_5gram_char_frac"] == 0.0
    assert r["repetition_flag"] == 0


def test_unigram_logprob_ranks_gibberish_low(spark):
    common = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, common) for i in range(1, 9)]
    rows.append((100, "zxqv wqpx jklm vbnf qwer tyui asdf ghjk"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in text_analysis.unigram_logprob_scores(docs).collect()
    }
    # the repeated doc's tokens dominate the corpus → high logprob;
    # the gibberish doc's tokens are rare singletons → much lower
    assert out[100]["avg_logprob"] < out[1]["avg_logprob"]
    assert out[1]["n_oov"] == 0  # small corpus: everything in vocab
    assert out[100]["oov_frac"] == 0.0


def test_tfidf_top_terms_ranking(spark):
    """A term concentrated in one source outranks corpus-wide terms
    there; ranks run 1..k with rounded-score-then-term ordering."""
    from evmtrace_etl_spark.operators.text_analysis import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "alpha alpha alpha shared", "s1"),
            (2, "shared words only", "s1"),
            (3, "beta beta shared words", "s2"),
            (4, "shared words only", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out = tfidf_top_terms(docs, k=2)
    rows = {(r.source, r.rank): r for r in out.collect()}
    assert rows[("s1", 1)].term == "alpha"
    assert rows[("s1", 1)].tf == 3 and rows[("s1", 1)].df == 1
    assert rows[("s2", 1)].term == "beta"
    assert len(rows) == 4  # k=2 per source


def test_hashed_tf_dense_composes_with_ann(spark):
    """The dense form is a drop-in embedding table: unit-norm vectors
    that flow straight into the similarity operators."""
    from evmtrace_etl_spark.operators.similarity import brute_force_topk
    from evmtrace_etl_spark.operators.text_analysis import hashed_tf_dense

    docs = spark.createDataFrame(
        [
            (0, "spark shuffles data between stages"),
            (1, "spark shuffles data between stages"),  # clone of 0
            (2, "an entirely different sentence about cats"),
        ],
        "doc_id long, text string",
    )
    emb = hashed_tf_dense(docs)
    rows = {r.vec_id: r.embedding for r in emb.collect()}
    assert len(rows) == 3 and all(len(v) == 64 for v in rows.values())
    for v in rows.values():  # unit norm (within rounding of weights)
        assert abs(sum(x * x for x in v) - 1.0) < 1e-4
    top = brute_force_topk(emb, n_queries=1, k=2)
    best = {r.rank: r for r in top.collect()}
    assert best[1].neighbor_id == 1 and best[1].sim == 1.0  # the clone


def test_sketch_profile_accuracy_vs_exact(spark):
    """The sketch profile has no oracle (engine-specific sketches);
    gate it against the exact operators instead: HLL++ distinct within
    3x its 2% rsd, t-digest median within the exact p25-p75 band."""
    from pyspark.sql import functions as F
    from evmtrace_etl_spark.functions.text import tokens
    from evmtrace_etl_spark.operators.text_analysis import sketch_profile

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = {r.source: r for r in sketch_profile(docs).collect()}
    exact_distinct = {
        r.source: r.nd
        for r in docs.select(
            "source", F.explode(tokens("text")).alias("t")
        )
        .groupBy("source")
        .agg(F.countDistinct("t").alias("nd"))
        .collect()
    }
    exact_q = {
        r.source: (r.p25, r.p75)
        for r in docs.select("source", F.size(tokens("text")).alias("n"))
        .groupBy("source")
        .agg(
            F.expr("percentile(n, 0.25D)").alias("p25"),
            F.expr("percentile(n, 0.75D)").alias("p75"),
        )
        .collect()
    }
    assert set(got) == set(exact_distinct)
    for s, row in got.items():
        rel = abs(row.approx_distinct_tokens - exact_distinct[s]) / exact_distinct[s]
        assert rel < 0.06, f"{s}: HLL rel err {rel}"
        assert exact_q[s][0] <= row.p50_len <= exact_q[s][1]
        assert row.n_docs > 0 and row.p95_len >= row.p50_len
