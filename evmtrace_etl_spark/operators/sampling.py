"""Deterministic sharding + stratified sampling for training-data export
(no reference counterpart — the LLM-data tier's corpus-partitioning ops).

Both operators key on the shared ``functions.text.hash32`` (first 7 hex
digits of md5), so shard membership and sample selection are (a)
reproducible across runs and engines — the DuckDB oracle computes the
identical hash — and (b) independent of row order, partitioning, and
cluster size, which is what makes a 100 TB export resumable and
auditable.  Everything is JVM builtins: the hash is one md5 projection,
sampling is a narrow filter (no shuffle at all), and the shard rollup is
a single hash-keyed groupBy with map-side partials.

At scale the shard column is the write key:
``df.repartition(n_shards, "shard_id").write.partitionBy("shard_id")``
gives size-balanced, deterministic training shards; changing
``n_shards`` re-deals every doc with no coordination state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import hash32, token_count, tokens
from .text_analysis import doc_profile

#: Default deterministic shard count (a real export sizes this so each
#: shard lands in the 1-10 GB range).
N_SHARDS = 32

#: Per-quality-bucket keep percentage (out of 100) for the stratified
#: sample: keep clean text, downsample noisy strata, drop fragments.
SAMPLE_RATES = {
    "ok": 80,
    "punct_heavy": 25,
    "low_signal": 10,
    "too_short": 0,
}


def _keep_hash(id_col: str, salt: str) -> F.Column:
    """Uniform [0, 100) bucket from the salted doc id — the salt decouples
    independent sampling decisions made over the same corpus."""
    return (
        hash32(F.concat(F.lit(salt + "#"), F.col(id_col).cast("string")))
        % 100
    )


def with_shard(
    docs: DataFrame, n_shards: int = N_SHARDS, id_col: str = "doc_id"
) -> DataFrame:
    """``shard_id`` ∈ [0, n_shards) from the hashed doc id."""
    return docs.withColumn(
        "shard_id",
        hash32(
            F.concat(F.lit("shard#"), F.col(id_col).cast("string"))
        )
        % n_shards,
    )


def train_shards(
    docs: DataFrame, n_shards: int = N_SHARDS, text_col: str = "text"
) -> DataFrame:
    """Per-shard manifest of the deterministic shard assignment.

    Output: shard_id, n_docs, total_tokens, n_sources, min_doc_id,
    max_doc_id — the audit row a shard writer emits next to each shard.
    """
    return (
        with_shard(docs, n_shards)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(text_col).cast("long")).alias("total_tokens"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


def stratified_sample_stats(
    docs: DataFrame,
    rates: dict[str, int] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Quality-stratified deterministic sampling, reported per stratum.

    A doc is kept iff ``hash32('sample#' || doc_id) % 100 < rate[bucket]``
    — a pure projection + filter, so the sampled corpus is reproducible
    and the pass is shuffle-free until this audit rollup.

    Output: quality_bucket, n_total, n_sampled, sampled_tokens,
    min_sampled_doc_id, max_sampled_doc_id.
    """
    rates = rates if rates is not None else SAMPLE_RATES
    prof = doc_profile(docs, text_col)
    rate = F.lit(None).cast("long")
    for bucket, pct in sorted(rates.items()):
        rate = F.when(F.col("quality_bucket") == bucket, pct).otherwise(rate)
    keep = _keep_hash("doc_id", "sample") < rate
    return (
        prof.withColumn("_keep", keep)
        .groupBy("quality_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("_keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_sampled"),
            F.sum(
                F.when(F.col("_keep"), F.col("n_tokens")).otherwise(0)
            )
            .cast("long")
            .alias("sampled_tokens"),
            F.min(F.when(F.col("_keep"), F.col("doc_id"))).alias(
                "min_sampled_doc_id"
            ),
            F.max(F.when(F.col("_keep"), F.col("doc_id"))).alias(
                "max_sampled_doc_id"
            ),
        )
    )


#: Fixed token budget per packed training sequence.
PACK_BUDGET = 2048


def pack_sequences(
    docs: DataFrame,
    budget: int = PACK_BUDGET,
    n_shards: int = N_SHARDS,
    text_col: str = "text",
) -> DataFrame:
    """Sequence-packing manifest: docs are laid into one contiguous
    token stream per shard (deterministic hash order) and cut into
    fixed ``budget``-token windows — the packed-pretraining layout
    (no padding; a doc whose tokens straddle a cut crosses into the
    next pack).

    Output per pack: shard_id, pack_id, n_docs (docs starting in the
    pack), pack_tokens (their token sum), crosses_boundary (1 when the
    pack's last-starting doc spills into the next pack).  Zero-token
    docs are excluded (they occupy no stream positions).

    Scale shape: ONE window per shard stream (partitionBy shard_id,
    orderBy (hash, doc_id)) computes each doc's start offset as a
    running sum, then ONE (shard_id, pack_id) rollup.  Parallelism =
    n_shards, the export knob: shard streams are independent, so a
    100 TB run sizes n_shards to the cluster and each window sorts one
    shard's manifest rows (doc_id + token count — not text).
    """
    sharded = (
        with_shard(docs, n_shards)
        .select(
            "doc_id",
            "shard_id",
            token_count(text_col).cast("long").alias("_tok"),
            hash32(
                F.concat(F.lit("pack#"), F.col("doc_id").cast("string"))
            ).alias("_ord"),
        )
        .filter(F.col("_tok") > 0)
    )
    w = Window.partitionBy("shard_id").orderBy("_ord", "doc_id")
    start = F.sum("_tok").over(w) - F.col("_tok")
    placed = sharded.select(
        "shard_id",
        "_tok",
        F.floor(start / budget).cast("long").alias("pack_id"),
        ((start % budget) + F.col("_tok") > budget)
        .cast("int")
        .alias("_crosses"),
    )
    return placed.groupBy("shard_id", "pack_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_tok").cast("long").alias("pack_tokens"),
        F.max("_crosses").cast("int").alias("crosses_boundary"),
    )


#: Training-chunk defaults: window size and stride in tokens (stride <
#: chunk ⇒ overlapping context windows, the usual LM pretraining shape).
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


def chunk_docs(
    docs: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Cut every document into overlapping fixed-size token windows —
    the per-document chunk manifest for context-window training (the
    within-doc complement of ``pack_sequences``, which packs across
    docs).

    Output: doc_id, chunk_id, start_tok (1-based), n_tokens,
    chunk_fp (md5 of the space-joined window — the join key for
    chunk-level dedup downstream).  Docs with no tokens emit nothing;
    a doc shorter than ``chunk_tokens`` emits exactly one (short)
    chunk.  Starts are stride-aligned with the last start ≤
    ``len - chunk + 1`` — DROP-REMAINDER semantics: a tail of fewer
    than ``stride`` tokens past the last aligned window is not emitted
    (coverage is exact when ``stride`` divides ``len - chunk``; a
    non-aligned tail window would duplicate suffix content and break
    the ``chunk_id == (start_tok - 1) / stride`` arithmetic both
    engines rely on).

    Scale shape: tokenize → per-row ``sequence``/``explode``/``slice``
    array math, all JVM builtins — a pure narrow 1→N projection with
    ZERO shuffle (pinned in ``tests/test_plan_shapes.py``); chunk count
    scales with token count, never with corpus size.
    """
    base = docs.select(
        "doc_id", tokens(text_col).alias("_toks")
    ).filter(F.size("_toks") >= 1)
    starts = F.sequence(
        F.lit(1),
        F.greatest(
            F.size("_toks") - F.lit(chunk_tokens - 1), F.lit(1)
        ),
        F.lit(stride),
    )
    exploded = base.select(
        "doc_id", "_toks", F.explode(starts).alias("start_tok")
    )
    window = F.slice(F.col("_toks"), F.col("start_tok"), chunk_tokens)
    return exploded.select(
        "doc_id",
        ((F.col("start_tok") - 1) / stride).cast("long").alias("chunk_id"),
        F.col("start_tok").cast("long"),
        F.size(window).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", window)).alias("chunk_fp"),
    )


def chunk_dup_groups(
    docs: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Sub-document dedup: chunks (from ``chunk_docs``) whose window
    fingerprint recurs — repeated boilerplate passages that survive
    doc-level dedup because their surrounding documents differ.

    Output: chunk_fp, n_chunks, n_docs, doc_ids (sorted distinct,
    comma-joined) for every fingerprint seen more than once.

    Scale shape: two-level aggregate over the narrow chunk manifest —
    level 1 groups by (chunk_fp, doc_id) so level 2's ``n_docs`` is a
    plain count of pre-distinct rows (NO count_distinct, so no Expand
    doubling the shuffle) and ``doc_ids`` collects already-unique ids;
    both exchanges key on the uniform md5 fingerprint, no salting
    needed.  Same shape as doc-level ``exact_dup_groups``, one level
    down.
    """
    chunks = chunk_docs(docs, text_col, chunk_tokens, stride)
    per_doc = chunks.groupBy("chunk_fp", "doc_id").agg(
        F.count(F.lit(1)).alias("_c")
    )
    return (
        per_doc.groupBy("chunk_fp")
        .agg(
            F.sum("_c").cast("long").alias("n_chunks"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("doc_ids"),
        )
        .filter(F.col("n_chunks") > 1)
    )


#: Temperature exponent for source-mixture weighting (alpha < 1 upweights
#: small sources, the multilingual-sampling convention).
MIXTURE_ALPHA = 0.5
#: Docs per training epoch that the mixture allocates.
MIXTURE_BUDGET = 100_000


def source_mixture(
    docs: DataFrame,
    alpha: float = MIXTURE_ALPHA,
    budget: int = MIXTURE_BUDGET,
    text_col: str = "text",
) -> DataFrame:
    """Temperature-weighted training mixture over sources: weight_s =
    tokens_s^alpha / Σ tokens^alpha — alpha < 1 flattens the size
    distribution toward uniform (the standard way to keep small
    high-quality feeds from drowning in web-scale ones) — and a per-
    epoch document allocation under ``budget``.

    Output: source, n_docs, total_tokens, weight (6 dp),
    docs_per_epoch (floor of weight × budget).

    Scale shape: one per-source aggregate (map-side partials absorb the
    corpus), then the Σ tokens^alpha normalizer joins back as a
    BROADCAST scalar — the per-source table is |sources| rows, so both
    stages are trivially small after the first rollup.
    """
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(token_count(text_col).cast("long"))
        .cast("long")
        .alias("total_tokens"),
    )
    # sqrt for the default alpha: IEEE-754 requires sqrt to be correctly
    # rounded, so Spark (JVM) and DuckDB (libm) agree bit-for-bit; pow
    # carries no such guarantee across math libraries, so non-default
    # alphas are supported but not oracle-pinned.
    tok_d = F.col("total_tokens").cast("double")
    powed = per_src.withColumn(
        "_pw",
        F.sqrt(tok_d) if alpha == 0.5 else F.pow(tok_d, F.lit(alpha)),
    )
    # exact, order-independent normalizer: double summation is neither
    # (Spark's partition order vs DuckDB's scan order could differ by
    # ulps and flip round(weight, 6) / floor at boundaries), so each
    # term is fixed to 12 dp and summed as DECIMAL, then divided as
    # double
    total = powed.agg(
        F.sum(F.col("_pw").cast("decimal(38,12)"))
        .cast("double")
        .alias("_tot")
    )
    return (
        powed.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.round(F.col("_pw") / F.col("_tot"), 6).alias("weight"),
            F.floor(
                F.col("_pw") / F.col("_tot") * F.lit(float(budget))
            )
            .cast("long")
            .alias("docs_per_epoch"),
        )
    )


#: Deterministic corpus split: hash bucket < 90 → train, < 95 → val,
#: else test.  Hash-derived (not positional) so membership is stable
#: under corpus growth, reordering, and re-partitioning — a doc never
#: migrates between splits, which is what keeps val/test leakage-free
#: across refreshes.
SPLIT_BOUNDS = (("train", 90), ("val", 95))


def split_col() -> F.Column:
    """The split-assignment expression itself — a pure narrow
    projection over the salted doc-id hash, shared by the manifest and
    the leakage audit so both see the identical membership."""
    split = F.lit("test")
    b = _keep_hash("doc_id", "split")
    for name, bound in reversed(SPLIT_BOUNDS):
        split = F.when(b < bound, name).otherwise(split)
    return split


def split_manifest(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Train/val/test split assignment + per-(source, split) audit.

    The assignment itself is a pure narrow projection (the export path
    is ``filter(split = 'train')`` — shuffle-free); this manifest is
    the audit rollup a split writer emits: per source and split, doc
    and token counts plus the id range.  Reviewing it per source is
    how skewed strata get caught (a source whose val slice is near
    empty needs per-source rates, not the global 90/5/5).

    Output: source, split, n_docs, total_tokens, min_doc_id,
    max_doc_id.
    """
    return (
        docs.withColumn("split", split_col())
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(text_col).cast("long")).alias(
                "total_tokens"
            ),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


def split_leakage(
    docs: DataFrame, text_col: str = "text", threshold: float = 0.5
) -> DataFrame:
    """Train→eval near-duplicate leakage audit over the split manifest.

    Exact-duplicate leakage is necessary but not sufficient: a test
    document that is a NEAR-duplicate of a training document
    (boilerplate reflow, small edits) still contaminates evaluation.
    This composes the L39 hash-split assignment with the L2 MinHash/LSH
    pair graph: every verified near-dup pair with exactly one endpoint
    in ``train`` is a leak into the other endpoint's eval split.

    Scale shape: the pair list comes from the bucket-capped LSH join
    (never all-pairs); split assignment is a narrow projection; the two
    endpoint lookups are plain ``doc_id`` hash equi-joins; the rollup
    key space is the eval splits (≤ 2 rows).  ``count_distinct``
    expands only the leak pairs, not the corpus.

    Output: split, n_leak_pairs, n_leaked_docs (distinct eval-side
    docs), max_jaccard.
    """
    from .dedup import near_dup_pairs

    sp = docs.select("doc_id", split_col().alias("split"))
    pairs = near_dup_pairs(docs, text_col, threshold)
    j = pairs.join(
        sp.select(
            F.col("doc_id").alias("doc_a"), F.col("split").alias("_sa")
        ),
        on="doc_a",
    ).join(
        sp.select(
            F.col("doc_id").alias("doc_b"), F.col("split").alias("_sb")
        ),
        on="doc_b",
    )
    a_train = F.col("_sa") == "train"
    b_train = F.col("_sb") == "train"
    eval_split = F.when(a_train & ~b_train, F.col("_sb")).when(
        b_train & ~a_train, F.col("_sa")
    )
    leaked_doc = F.when(a_train, F.col("doc_b")).otherwise(F.col("doc_a"))
    return (
        j.withColumn("split", eval_split)
        .filter(F.col("split").isNotNull())
        .withColumn("_leak_doc", leaked_doc)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_leak_pairs"),
            F.count_distinct(F.col("_leak_doc")).alias("n_leaked_docs"),
            F.round(F.max("jaccard"), 6).alias("max_jaccard"),
        )
    )


#: Denominator turning the 28-bit hash into u ∈ (0, 1): 16^7 + 1
#: (hash+1 ≤ 16^7 < denom, so u never reaches 1; never 0 either — both
#: endpoints would break ln(u) or collapse a key).
_WS_DENOM = 268_435_457.0

#: Sample size for the registered weighted-sample query.
WEIGHTED_K = 100


def weighted_sample(
    docs: DataFrame,
    k: int = WEIGHTED_K,
    text_col: str = "text",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-ES /
    exponential-sort, Efraimidis & Spirakis 2006): each doc draws a
    pseudo-random u ∈ (0, 1) from its salted hash and is ranked by
    ``-ln(u) / w`` ascending (equivalent to the classic ``u^(1/w)``
    descending), so P(selection) is proportional to the weight — here
    token count, the length-proportional draw a token-budgeted training
    mix wants.  Deterministic: same corpus → same sample, no RNG state.

    Scale shape: weight + key are one narrow projection; the top-k cut
    is ``orderBy().limit(k)`` — TakeOrderedAndProject (per-partition
    heaps + driver merge of k rows), never a full sort — and the rank
    window runs over the k surviving rows only (bounded, single task by
    construction).  Cross-engine exactness: ln is libm-rounded (≤1 ulp
    apart across engines), so keys are ROUNDED to 6 dp before ranking
    with doc_id as the tiebreak — the repo's ranks-after-rounding rule.

    Output: rank, doc_id, source, n_toks, sample_key.
    """
    u = (
        hash32(F.concat(F.lit("wsamp#"), F.col("doc_id").cast("string")))
        + F.lit(1)
    ).cast("double") / F.lit(_WS_DENOM)
    keyed = (
        docs.withColumn("n_toks", token_count(text_col).cast("long"))
        .filter(F.col("n_toks") >= 1)
        .withColumn(
            "sample_key",
            F.round(-F.log(u) / F.col("n_toks").cast("double"), 6),
        )
    )
    top = keyed.orderBy(
        F.col("sample_key").asc(), F.col("doc_id").asc()
    ).limit(k)
    w = Window.orderBy(F.col("sample_key").asc(), F.col("doc_id").asc())
    return top.select(
        F.row_number().over(w).alias("rank"),
        "doc_id",
        "source",
        "n_toks",
        "sample_key",
    )


def _rdv_hashes_expr(n_shards: int) -> str:
    """SQL expr: per-shard rendezvous hashes for doc_id (same
    md5-prefix hash as functions.text.hash32, computed per shard id)."""
    return (
        f"transform(sequence(0, {n_shards - 1}), s -> "
        "CAST(conv(substring(md5(concat('rdv#', CAST(doc_id AS STRING), "
        "'#', CAST(s AS STRING))), 1, 7), 16, 10) AS BIGINT))"
    )


def rendezvous_shard_col(n_shards: int) -> F.Column:
    """Rendezvous / highest-random-weight shard for ``doc_id``: each
    (doc, shard) pair draws a deterministic hash and the doc goes to
    the highest-scoring shard (first index on ties).  Unlike mod-hash
    sharding, scaling n → n+1 moves only ~1/(n+1) of the corpus — the
    property that makes resharding a 100 TB corpus an incremental copy
    instead of a full rewrite."""
    hs = _rdv_hashes_expr(n_shards)
    return F.expr(
        f"CAST(array_position({hs}, array_max({hs})) - 1 AS INT)"
    )


def rendezvous_stability(
    docs: DataFrame, n_a: int = N_SHARDS, n_b: int = N_SHARDS + 1
) -> DataFrame:
    """Measured resharding cost of rendezvous sharding: assign every
    doc under ``n_a`` and ``n_b`` shards and report how much moved.
    Expected moved fraction ≈ 1/n_b for HRW (vs (n_b-1)/n_b for
    mod-hashing) — this row is the measured justification for using
    rendezvous assignment when shard counts evolve.

    One narrow projection + one global aggregate; zero joins/shuffles
    beyond the final 1-row rollup.

    Output (one row): n_docs, n_moved, moved_frac (round 6),
    max_shard_a (occupancy skew check under n_a).
    """
    assigned = docs.select(
        "doc_id",
        rendezvous_shard_col(n_a).alias("_sa"),
        rendezvous_shard_col(n_b).alias("_sb"),
    )
    per_shard = assigned.groupBy("_sa").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(
            F.when(F.col("_sa") != F.col("_sb"), 1).otherwise(0)
        ).alias("_m"),
    )
    return per_shard.agg(
        F.sum("_n").cast("long").alias("n_docs"),
        F.sum("_m").cast("long").alias("n_moved"),
        F.round(
            F.sum("_m").cast("double") / F.sum("_n").cast("double"), 6
        ).alias("moved_frac"),
        F.max("_n").cast("long").alias("max_shard_a"),
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (hashed n-gram importance resampling)
# ---------------------------------------------------------------------------

#: Hashed n-gram feature dimension for the importance model.  Small by
#: design: the two count vectors must broadcast (DSIR's published
#: setting is 10^4 buckets for web-scale corpora — still broadcastable).
DSIR_DIM = 128

#: Registered-query selection size.
DSIR_K = 200


def dsir_weights(
    docs: DataFrame,
    target_lang: str = "en",
    dim: int = DSIR_DIM,
    k: int = DSIR_K,
    text_col: str = "text",
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
    rank raw-pool documents by how target-like they are under hashed
    unigram bag-of-words models of the target vs the raw distribution.

    Per doc: avg log importance ratio
    ``mean_t[ ln P_target(bucket(t)) - ln P_raw(bucket(t)) ]`` with
    add-one smoothing over ``dim`` hash buckets; the top-k by that
    score are the docs DSIR would resample into training.

    Scale shape (100 TB): ONE corpus pass.  The per-doc bucket
    histogram's shuffle is shared (ReuseExchange) with the model
    build, which re-aggregates it to ≤ ``dim`` rows; the corpus totals
    come from a global window over THAT ``dim``-row table (bounded
    single task by construction), never from a corpus re-scan; the
    finished model joins back BROADCAST, then one doc-keyed rollup and
    a ``TakeOrderedAndProject`` k-cut.  No all-pairs work, nothing
    corpus-sized on the driver.  (Buckets no token hashes to never
    appear in any histogram, so no zero-count spine is needed.)

    Determinism: per-bucket log ratios are computed from exact integer
    counts (double division of exact ints is correctly rounded in both
    engines), truncated to ``decimal(38,12)`` to absorb ln's ≤ 1-ulp
    cross-engine wobble, multiplied back in double (exact-int × fixed
    double, correctly rounded), and summed as decimals — the package's
    standard accumulation-order-free recipe; ranks are taken on the
    6-dp-rounded score with a doc_id tie-break.

    Output: doc_id, n_tokens, avg_logratio (round 6), top-k.
    """
    toks = docs.select(
        "doc_id",
        F.col("lang"),
        F.explode(tokens(text_col)).alias("_t"),
    ).select(
        "doc_id",
        "lang",
        F.pmod(hash32(F.col("_t")), F.lit(dim)).alias("bucket"),
    )
    # lang is functionally dependent on doc_id, so carrying it through
    # the histogram key changes nothing about cardinality — and lets
    # the model's two count vectors derive from the histogram instead
    # of re-tokenizing the corpus.  The histogram is materialized
    # because BOTH the model build and the scoring pass consume it:
    # it is the reduced table here (≤ dim rows per doc vs raw text),
    # and persisting it replaces a second full tokenize of the corpus
    # with a columnar re-read.
    from ..session import materialize

    hist = materialize(
        toks.groupBy("doc_id", "lang", "bucket").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
    )
    counts = hist.groupBy("bucket").agg(
        F.sum("c").cast("long").alias("rc"),
        F.sum(
            F.when(F.col("lang") == target_lang, F.col("c")).otherwise(0)
        ).cast("long").alias("tc"),
    )
    # Corpus totals as a global window over the ≤ dim-row count table:
    # a deliberately bounded single task (cf. the codebook collects
    # elsewhere), NOT a window over anything corpus-sized — and
    # crucially not a separate aggregate branch, which column pruning
    # would specialize into a second corpus scan that ReuseExchange
    # can't dedupe.
    w = Window.partitionBy()
    model = counts.select(
        "bucket",
        # ln( ((tc+1)/(T+dim)) / ((rc+1)/(S+dim)) ) over exact ints;
        # the decimal(38,12) truncation absorbs ln's ulp wobble, the
        # cast back to double is then engine-identical.
        F.log(
            (
                (F.col("tc") + 1)
                * (F.sum("rc").over(w).cast("long") + dim)
            ).cast("double")
            / (
                (F.col("rc") + 1)
                * (F.sum("tc").over(w).cast("long") + dim)
            ).cast("double")
        )
        .cast("decimal(38,12)")
        .cast("double")
        .alias("lr"),
    )
    scored = (
        hist.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(
                (F.col("c").cast("double") * F.col("lr")).cast(
                    "decimal(38,12)"
                )
            ).alias("_sum"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.col("_sum").cast("double") / F.col("n_tokens"), 6
            ).alias("avg_logratio"),
        )
    )
    return scored.orderBy(
        F.col("avg_logratio").desc(), F.col("doc_id").asc()
    ).limit(k)
