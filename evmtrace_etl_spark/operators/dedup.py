"""Deduplication operators for the LLM-training-data pipeline.

Four families over a ``documents(doc_id, text, ...)`` table:

- **exact**: hash-groupBy on a normalized-text fingerprint (md5).
- **MinHash + LSH near-dup**: shingle → minhash signature → banded
  bucket keys → candidate pairs ONLY within buckets (never all-pairs)
  → exact n-gram Jaccard verification on the shingle-hash sets.
- **SimHash**: 32-bit signature per doc; identical-signature buckets.
- **n-gram Jaccard**: the verification stage, exposed standalone.

Scale design (100 TB): the per-doc stages (tokenize/shingle/hash/sign)
are narrow (no shuffle).  The LSH stage shuffles (band_id, band_key)
— md5-uniform keys, so no skew salting needed; ``BUCKET_CAP`` drops
degenerate buckets (boilerplate duplicates collapsing into one bucket
would otherwise go quadratic — at cap 64 a bucket contributes ≤ 2016
pairs).  The pair join is an equi-join on doc_id against the compact
signature table.  Every stage is expressible to Catalyst — filters and
projections push into the parquet scan.

Reference parity: the reference engine has only keyed dedup
(src/dumper/postgres.rs:53-66, etl_result.rs:205-248 — D1/D2/D4); the
near-dup family is the LLM-data extension required by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import (
    BUCKET_CAP,
    LSH_BANDS,
    SHINGLE_K,
    band_keys,
    fingerprint,
    hash_array32,
    minhash_signature,
    shingles,
    simhash32,
    token_count,
    tokens,
)


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("fingerprint", fingerprint(text_col))


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups: one row per fingerprint having >1 doc.

    Output: fingerprint, n_dups, keep_doc_id (min), dup_doc_ids (sorted).
    """
    return (
        with_fingerprint(docs, text_col)
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("keep_doc_id"),
            F.sort_array(F.collect_list("doc_id")).alias("dup_doc_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the lowest doc_id per fingerprint (keep-first semantics of the
    reference's D2, re-keyed on content hash)."""
    w = Window.partitionBy("fingerprint").orderBy(F.col("doc_id").asc())
    return (
        with_fingerprint(docs, text_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "fingerprint")
    )


def shingle_hashes(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id + distinct shingle-hash set; docs with < SHINGLE_K tokens are
    excluded (no shingles → no near-dup signal)."""
    toks = tokens(text_col)
    return (
        docs.select("doc_id", toks.alias("_toks"))
        .filter(F.size("_toks") >= SHINGLE_K)
        .select(
            "doc_id",
            F.array_distinct(
                F.sort_array(hash_array32(shingles(F.col("_toks"))))
            ).alias("shingle_set"),
        )
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id, minhash signature (N_PERMS longs), band keys (LSH_BANDS).

    The shingle-set projection is persisted first: without a barrier,
    Catalyst's CollapseProject inlines the tokenize→shingle→md5 chain
    into every one of the 16 minhash + 4 band expressions (a 20×
    recompute).  The persisted table is doc_id + ~50 ints — a tiny
    fraction of the raw corpus, the standard trade at scale."""
    sh = shingle_hashes(docs, text_col).persist()
    return _signatures_from_sets(sh)


def _signatures_from_sets(sh: DataFrame) -> DataFrame:
    sig = minhash_signature(F.col("shingle_set"))
    return sh.select(
        "doc_id",
        "shingle_set",
        sig.alias("signature"),
    ).withColumn("bands", band_keys(F.col("signature")))


def lsh_candidate_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct candidate pairs (doc_a < doc_b) sharing ≥1 LSH band bucket.

    Buckets larger than BUCKET_CAP are dropped (skew guard — documented
    coverage trade-off, identical in the oracle)."""
    return _pairs_from_sigs(minhash_signatures(docs, text_col))


def _pairs_from_sigs(sigs: DataFrame) -> DataFrame:
    buckets = sigs.select(
        "doc_id",
        F.posexplode("bands").alias("band_id", "band_key"),
    )
    sized = buckets.withColumn(
        "_n",
        F.count(F.lit(1)).over(Window.partitionBy("band_id", "band_key")),
    ).filter(F.col("_n") <= BUCKET_CAP)
    a = sized.select("band_id", "band_key", F.col("doc_id").alias("doc_a"))
    b = sized.select("band_id", "band_key", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, on=["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def near_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash/LSH candidates verified by exact n-gram Jaccard on the
    distinct shingle-hash sets.  Output: doc_a, doc_b, jaccard (double).
    """
    sets_ = shingle_hashes(docs, text_col).persist()
    pairs = _pairs_from_sigs(_signatures_from_sets(sets_))
    sa = sets_.select(
        F.col("doc_id").alias("doc_a"), F.col("shingle_set").alias("_set_a")
    )
    sb = sets_.select(
        F.col("doc_id").alias("doc_b"), F.col("shingle_set").alias("_set_b")
    )
    inter = F.size(F.array_intersect(F.col("_set_a"), F.col("_set_b")))
    union = F.size(F.col("_set_a")) + F.size(F.col("_set_b")) - inter
    return (
        pairs.join(sa, on="doc_a")
        .join(sb, on="doc_b")
        .withColumn(
            "jaccard",
            inter.cast("double") / union.cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Standalone n-gram-Jaccard similarity for LSH candidates (no
    threshold) — the 'verify' stage exposed as its own operator."""
    return near_dup_pairs(docs, text_col, threshold=0.0)


def simhash_docs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id + 32-bit simhash over the token-hash multiset (docs with no
    tokens excluded — empty sum would set every bit)."""
    toks = tokens(text_col)
    # persist the token-hash projection: the 32 per-bit aggregates would
    # otherwise each inline (and recompute) the md5 chain
    th = (
        docs.select("doc_id", toks.alias("_toks"))
        .filter(F.size("_toks") >= 1)
        .select("doc_id", hash_array32(F.col("_toks")).alias("_th"))
        .persist()
    )
    return th.select("doc_id", simhash32(F.col("_th")).alias("simhash"))


def simhash_buckets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Identical-simhash buckets with >1 member (near-dup clusters at
    Hamming distance 0)."""
    return (
        simhash_docs(docs, text_col)
        .groupBy("simhash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )
