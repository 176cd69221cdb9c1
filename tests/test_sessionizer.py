"""Punctuation sessionizer (T1 true-streaming port): reference semantics
— root commits the previous session, duplicate roots start NEW sessions,
the final session per chain is never committed — in both batch one-shot
and multi-micro-batch streaming execution."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from evmtrace_etl_spark.operators.trace_tree import edge_aggregate
from evmtrace_etl_spark.sources import fixtures
from evmtrace_etl_spark.streaming.sessionizer import (
    session_edges,
    session_roots,
    sessionize_traces,
)

# sessions left OPEN at stream end (never committed, reference artifact):
# chain 1 ends in tx10, chain 10 ends in tx8
OPEN_TX = {(1, fixtures.TXH[10]), (10, fixtures.TXH[1])}
# tx7 commits as TWO sessions (duplicate root punctuation)
DUP_TX = (1, fixtures.TXH[7])


def _edges_by_tx(df):
    out = {}
    for r in df.collect():
        out.setdefault((r.chain_id, r.transaction_hash), []).append(r)
    return out


def test_batch_sessionize_matches_reference_semantics(spark):
    traces = fixtures.traces_df(spark).repartition(4)
    out = sessionize_traces(traces).cache()
    got = _edges_by_tx(session_edges(out))

    batch = _edges_by_tx(edge_aggregate(fixtures.traces_df(spark)))

    # open sessions never emit
    for key in OPEN_TX:
        assert key not in got
    # committed single-session txs match the batch edge aggregate exactly
    for key, batch_rows in batch.items():
        if key in OPEN_TX or key == DUP_TX:
            continue
        want = sorted(
            (r.from_address, r.to_address, r.call_count, r.gas_sum)
            for r in batch_rows
        )
        have = sorted(
            (r.from_address, r.to_address, r.call_count, r.gas_sum)
            for r in got[key]
        )
        assert have == want, key

    # tx7: two sessions → the EOA2→C7 root edge appears once per session
    # (the batch aggregate merges them into one count-2 edge)
    tx7 = [
        r
        for r in got[DUP_TX]
        if r.from_address == fixtures.EOA2 and r.to_address == fixtures.C7
    ]
    assert sorted(r.gas_sum for r in tx7) == [70000, 70007]
    assert all(r.call_count == 1 for r in tx7)

    # roots carry commit-eligible fields
    roots = session_roots(out)
    tx1_root = roots.filter(
        (F.col("chain_id") == 1)
        & (F.col("transaction_hash") == fixtures.TXH[1])
    ).first()
    assert tx1_root.from_address == fixtures.EOA1
    assert tx1_root.value == 1000


def test_sessionizer_mid_stream_start(spark):
    """A stream that starts MID-transaction (child traces before the
    chain's first root) must not commit the rootless pre-root session:
    the reference builds its Transaction from the root's fields, and the
    session oracle scopes edges to root-keyed sessions."""
    traces = fixtures.traces_df(spark).filter("chain_id = 1")
    # drop everything up to and including the first root (seq 1 is tx1's
    # root): the stream now opens with tx1's child traces
    headless = traces.filter("seq > 1")
    out = sessionize_traces(headless).cache()
    got = _edges_by_tx(session_edges(out))

    # tx1's pre-root children produced edges in the open tree, but the
    # session has no root → nothing committed for tx1
    assert (1, fixtures.TXH[1]) not in got
    # the next rooted session (tx2) still commits normally
    full = _edges_by_tx(session_edges(sessionize_traces(traces)))
    key = (1, fixtures.TXH[2])
    want = sorted((r.from_address, r.to_address, r.call_count) for r in full[key])
    have = sorted((r.from_address, r.to_address, r.call_count) for r in got[key])
    assert have == want
    # and no rootless root-rows leaked
    assert session_roots(out).filter(
        F.col("transaction_hash") == fixtures.TXH[1]
    ).count() == 0


def test_streaming_sessionize_across_microbatches(spark, tmp_path):
    """Sessions spanning micro-batch boundaries must commit identically:
    split the fixture into two files, trigger one file per batch."""
    traces = fixtures.traces_df(spark)
    d = tmp_path / "in"
    d.mkdir()
    # split mid-session (seq 62 is tx7's second root; cut at 61 so tx7's
    # first session closes in batch 1 and its state carries into batch 2)
    traces.filter("seq <= 61").coalesce(1).write.json(str(d / "f0"))
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    traces.filter("seq > 61").coalesce(1).write.json(str(d / "f1"))

    stream = (
        spark.readStream.schema(fixtures.TRACE_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(d / "*"))
    )
    q = (
        sessionize_traces(stream)
        .writeStream.format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    streamed = _edges_by_tx(
        session_edges(spark.table("sess_out"))
    )
    batch_run = _edges_by_tx(
        session_edges(sessionize_traces(fixtures.traces_df(spark)))
    )
    assert set(streamed) == set(batch_run)
    for key, rows in batch_run.items():
        want = sorted((r.from_address, r.to_address, r.call_count) for r in rows)
        have = sorted(
            (r.from_address, r.to_address, r.call_count) for r in streamed[key]
        )
        assert have == want, key
