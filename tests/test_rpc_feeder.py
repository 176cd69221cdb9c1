"""S4–S6/T4 feeder plumbing and the J6 enrichment join."""

from __future__ import annotations

import json

import pytest

from evmtrace_etl_spark.operators.enrichment import enrich_blocks
from evmtrace_etl_spark.operators.geth_ingest import flatten_call_frames
from evmtrace_etl_spark.sources import fixtures, geth_fixtures
from evmtrace_etl_spark.sources.rpc import RpcClient, frames_to_df, retry


def test_retry_constant_backoff():
    calls, sleeps = [], []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise ConnectionError("transient")
        return "ok"

    assert retry(flaky, sleep=sleeps.append) == "ok"
    assert len(calls) == 3
    assert sleeps == [2.0, 2.0]  # reference: constant 2 s (ws/mod.rs:45-47)


def test_retry_exhaustion():
    def dead():
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        retry(dead, sleep=lambda _s: None)


def test_rpc_feeder_to_flatten(spark):
    """Fake transport → get_block + trace_block → frames df → flatten:
    the full S5/S6 path with the network stubbed at the transport."""
    tx_hashes = [h for _, _, _, h, _ in [(0, 0, 0, r[3], 0) for r in geth_fixtures.GETH_ROWS[:2]]]
    block = {
        "number": hex(500),
        "timestamp": hex(1_700_000_500),
        "hash": "0x" + "bb" * 32,
        "transactions": tx_hashes,
    }
    traced = [
        {"result": json.loads(geth_fixtures.GETH_ROWS[0][4])},
        {"result": json.loads(geth_fixtures.GETH_ROWS[1][4])},
    ]

    def transport(method, params):
        if method == "eth_getBlockByNumber":
            return block
        if method == "debug_traceBlockByNumber":
            assert params[1]["tracer"] == "callTracer"
            assert params[1]["tracerConfig"]["onlyTopCall"] is False
            return traced
        raise AssertionError(method)

    client = RpcClient(transport, sleep=lambda _s: None)
    fetched = client.get_block(500)
    frames = frames_to_df(spark, 1, fetched, client.trace_block(500))
    assert frames.count() == 2
    row = frames.first()
    assert row.transaction_index == 1  # 1-based (ws/mod.rs quirk)
    assert row.block_number == 500 and row.block_timestamp == 1_700_000_500

    flat = flatten_call_frames(frames)
    assert flat.count() == 6 + 1  # tx1 has 6 frames, tx2 is a leaf


def test_enrich_blocks_fills_missing_fields(spark):
    from pyspark.sql import functions as F

    from evmtrace_etl_spark.plans.pipeline import blocks_passthrough

    # detail lookups are unique per (chain, number) — dedupe the D3
    # fixture duplicate first, as the real path does
    blocks = blocks_passthrough(fixtures.blocks_df(spark))
    heads = blocks.withColumn(
        "transaction_count", F.lit(None).cast("int")
    ).withColumn("size", F.lit(None).cast("int"))
    enriched = enrich_blocks(heads, blocks)
    assert sorted(map(repr, enriched.collect())) == sorted(
        map(repr, blocks.collect())
    )
