"""Sharding/sampling determinism — the properties that make a 100 TB
export resumable: assignment is a pure function of the doc id, so it
cannot depend on partitioning, row order, or cluster size."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from evmtrace_etl_spark.operators import sampling

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_shard_assignment_partitioning_invariant(docs):
    a = _rows(sampling.train_shards(docs))
    b = _rows(sampling.train_shards(docs.repartition(13)))
    assert a == b


def test_shard_ids_in_range_and_total_preserved(docs):
    shards = sampling.train_shards(docs).collect()
    assert all(0 <= r.shard_id < sampling.N_SHARDS for r in shards)
    assert sum(r.n_docs for r in shards) == docs.count()


def test_stratified_sample_respects_rates(docs):
    stats = {r.quality_bucket: r for r in
             sampling.stratified_sample_stats(docs).collect()}
    for bucket, row in stats.items():
        assert 0 <= row.n_sampled <= row.n_total
        if sampling.SAMPLE_RATES.get(bucket) == 0:
            assert row.n_sampled == 0
            assert row.min_sampled_doc_id is None


def test_sample_selection_is_stable_across_runs(docs):
    a = _rows(sampling.stratified_sample_stats(docs))
    b = _rows(sampling.stratified_sample_stats(docs.repartition(7)))
    assert a == b


def test_shard_rollup_is_single_exchange(docs):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sampling.train_shards(docs).explain(mode="simple")
    plan = buf.getvalue()
    # narrow hash projection + one keyed aggregate; distinct-source adds
    # its expand within the same key, never a second full-data shuffle
    assert plan.count("Exchange") <= 2
    assert "EvalPython" not in plan


def test_pack_sequences_stream_invariants(docs):
    """Packs reconstruct a contiguous per-shard token stream: pack p's
    cumulative token count runs past p*budget (else p would be empty),
    and crosses_boundary is exactly 'the stream passes the next cut
    mid-doc'."""
    budget = sampling.PACK_BUDGET
    out = sampling.pack_sequences(docs).collect()
    from collections import defaultdict

    by_shard = defaultdict(list)
    for r in out:
        by_shard[r["shard_id"]].append(r)
    assert by_shard, "no packs produced"
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["pack_id"])
        ids = [r["pack_id"] for r in rows]
        # pack_ids never repeat (a long doc crossing several cuts may
        # swallow packs whole, so ids may skip — but only forward)
        assert ids == sorted(set(ids)), shard
        assert all(r["n_docs"] > 0 for r in rows)
        # the stream is contiguous: its total length must reach past
        # the last pack's start cut, and the last pack crosses the next
        # cut iff the stream runs past it
        total = sum(r["pack_tokens"] for r in rows)
        last = rows[-1]
        assert total > last["pack_id"] * budget
        if last["crosses_boundary"]:
            assert total > (last["pack_id"] + 1) * budget
        else:
            assert total <= (last["pack_id"] + 1) * budget


def test_pack_sequences_single_exchange(docs):
    """One shard-keyed Exchange feeds BOTH the running-offset window and
    the (shard, pack) rollup — the rollup's distribution requirement is
    satisfied by the window's partitioning, so no second shuffle."""
    import io, contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sampling.pack_sequences(docs).explain(mode="simple")
    plan = buf.getvalue()
    assert plan.count("Exchange") == 1
    assert plan.count("Window") == 1
    assert "EvalPython" not in plan


def _chunk_fixture(spark):
    """Docs spanning the chunking edge cases: empty (emits nothing),
    single token, one-below/at/above the window size, one full stride
    past it, and a long multi-window doc."""
    C, S = sampling.CHUNK_TOKENS, sampling.CHUNK_STRIDE
    sizes = {
        "empty": 0, "one": 1, "below": C - 1, "exact": C,
        "above": C + 1, "stride": C + S, "long": 3 * S + C + 7,
    }
    rows = [
        (i, name, " ".join(f"w{j}" for j in range(n)))
        for i, (name, n) in enumerate(sorted(sizes.items()))
    ]
    df = spark.createDataFrame(rows, "doc_id long, name string, text string")
    return df, {i: n for i, (_, n) in enumerate(sorted(sizes.items()))}


def test_chunk_docs_drop_remainder_coverage(spark):
    """Drop-remainder chunking pinned: windows are stride-aligned with
    chunk_id == (start_tok - 1) / stride, tokens [1, last_start+C-1]
    are covered contiguously, and the uncovered tail is strictly
    shorter than one stride (exact coverage when stride divides
    len - chunk)."""
    C, S = sampling.CHUNK_TOKENS, sampling.CHUNK_STRIDE
    df, sizes = _chunk_fixture(spark)
    out = sampling.chunk_docs(df).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    empty_ids = [i for i, n in sizes.items() if n == 0]
    for i in empty_ids:
        assert i not in by_doc  # the empty doc emits nothing
    for doc_id, n in sizes.items():
        if n == 0:
            continue
        chunks = sorted(by_doc[doc_id], key=lambda r: r["start_tok"])
        covered = set()
        for r in chunks:
            assert (r["start_tok"] - 1) % S == 0
            assert r["chunk_id"] == (r["start_tok"] - 1) // S
            assert 1 <= r["n_tokens"] <= C
            assert r["n_tokens"] == min(C, n - r["start_tok"] + 1)
            covered.update(
                range(r["start_tok"], r["start_tok"] + r["n_tokens"])
            )
        top = max(covered)
        assert covered == set(range(1, top + 1)), f"doc {doc_id} gap"
        assert n - top < S, f"doc {doc_id} dropped a full stride"
        if n <= C or (n - C) % S == 0:
            assert top == n  # exact coverage
        # a doc shorter than one window emits exactly one chunk
        if n <= C:
            assert len(chunks) == 1


def test_chunk_fp_keys_identical_windows(spark):
    """Two docs sharing an identical window produce the same chunk_fp —
    the join key chunk-level dedup relies on."""
    text = " ".join(f"w{j}" for j in range(sampling.CHUNK_TOKENS))
    df = spark.createDataFrame(
        [(1, text), (2, text + " tail0"), (3, "completely different")],
        "doc_id long, text string",
    )
    out = sampling.chunk_docs(df).collect()
    fp = {}
    for r in out:
        fp.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_fp"]
    assert fp[1][0] == fp[2][0]       # shared first window
    assert fp[1][0] != fp[3][0]
    dups = {r["chunk_fp"]: r for r in sampling.chunk_dup_groups(df).collect()}
    assert fp[1][0] in dups
    assert dups[fp[1][0]]["doc_ids"] == "1,2"
