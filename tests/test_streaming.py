"""Streaming + sink tier: file-source streaming must produce the same
sink contents as the batch pipeline; upserts must be idempotent; the
DBAPI sink must emit reference-parity ON CONFLICT semantics (sqlite and
Postgres share the syntax); decode must round-trip the strict schema."""

from __future__ import annotations

import json
import sqlite3
import urllib.request

import pytest

from evmtrace_etl_spark.plans.pipeline import zk_results
from evmtrace_etl_spark.sinks import DbApiUpsertSink, ParquetUpsertSink
from evmtrace_etl_spark.sources import fixtures
from evmtrace_etl_spark.streaming import monitor, runner, sources


def _rows(df):
    return sorted(map(repr, df.collect()))


@pytest.fixture()
def traces_json_dir(spark, tmp_path):
    d = tmp_path / "traces_json"
    fixtures.traces_df(spark).coalesce(1).write.json(str(d))
    return str(d)


def test_stream_matches_batch(spark, traces_json_dir, tmp_path):
    sink = ParquetUpsertSink(str(tmp_path / "sink"))
    q = runner.start_zk_stream(
        sources.file_trace_stream(spark, traces_json_dir),
        sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    from evmtrace_etl_spark.functions.evm import (
        CONTRACT_ADDRESS_COLS,
        TRANSACTION_ADDRESS_COLS,
        with_checksummed_addresses,
    )

    tx_batch, c_batch = zk_results(fixtures.traces_df(spark))
    tx_batch = with_checksummed_addresses(tx_batch, *TRANSACTION_ADDRESS_COLS)
    c_batch = with_checksummed_addresses(c_batch, *CONTRACT_ADDRESS_COLS)
    assert _rows(sink.read(spark, "transactions")) == _rows(tx_batch)
    assert _rows(sink.read(spark, "contracts")) == _rows(c_batch)


def test_stream_idempotent_replay(spark, traces_json_dir, tmp_path):
    sink = ParquetUpsertSink(str(tmp_path / "sink"))
    for i in range(2):  # same data replayed with a fresh checkpoint
        q = runner.start_zk_stream(
            sources.file_trace_stream(spark, traces_json_dir),
            sink,
            checkpoint_dir=str(tmp_path / f"ckpt{i}"),
        )
        q.awaitTermination(120)
    tx_batch, _ = zk_results(fixtures.traces_df(spark))
    assert sink.read(spark, "transactions").count() == tx_batch.count()


def test_block_stream_upsert(spark, tmp_path):
    d = tmp_path / "blocks_json"
    fixtures.blocks_df(spark).coalesce(1).write.json(str(d))
    sink = ParquetUpsertSink(str(tmp_path / "sink"))
    q = runner.start_block_stream(
        sources.file_block_stream(spark, str(d)),
        sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    from evmtrace_etl_spark.functions.evm import (
        BLOCK_ADDRESS_COLS,
        with_checksummed_addresses,
    )
    from evmtrace_etl_spark.plans.pipeline import blocks_passthrough

    assert _rows(sink.read(spark, "blocks")) == _rows(
        with_checksummed_addresses(
            blocks_passthrough(fixtures.blocks_df(spark)), *BLOCK_ADDRESS_COLS
        )
    )


def test_decode_payloads_roundtrip(spark):
    """S3: JSON payload → strict-schema decode reproduces the fixture
    (chain 1 rows; seq from the simulated offset column)."""
    src = fixtures.traces_df(spark).filter("chain_id = 1")
    payload_cols = [
        f.name for f in sources.TRACE_PAYLOAD_SCHEMA.fields
    ]
    wire = src.selectExpr(
        "to_json(struct(" + ", ".join(payload_cols) + ")) AS value",
        "seq AS offset",
    )
    decoded = sources.decode_payloads(
        wire, fixtures.TRACE_SCHEMA, chain_id=1
    )
    assert _rows(decoded) == _rows(src)


def test_dbapi_sink_on_conflict(spark):
    tx, _ = zk_results(fixtures.traces_df(spark))
    conn = sqlite3.connect(":memory:", check_same_thread=False)
    cols = ", ".join(c for c in tx.columns)
    conn.execute(
        f"CREATE TABLE transactions ({cols}, "
        "PRIMARY KEY (chain_id, transaction_hash))"
    )

    sink = DbApiUpsertSink(lambda: _NoCloseConn(conn))
    sink.upsert(tx, "transactions", runner.TX_KEYS, mode="ignore")
    n1 = conn.execute("SELECT count(*) FROM transactions").fetchone()[0]
    sink.upsert(tx, "transactions", runner.TX_KEYS, mode="ignore")
    n2 = conn.execute("SELECT count(*) FROM transactions").fetchone()[0]
    assert n1 == tx.count() and n2 == n1  # DO NOTHING held

    # blocks-style DO UPDATE
    conn.execute(
        "CREATE TABLE blocks (chain_id, number, gas_used, "
        "PRIMARY KEY (chain_id, number))"
    )
    b1 = spark.createDataFrame(
        [(1, 100, 5)], "chain_id long, number long, gas_used long"
    )
    b2 = spark.createDataFrame(
        [(1, 100, 9)], "chain_id long, number long, gas_used long"
    )
    sink.upsert(b1, "blocks", runner.BLOCK_KEYS, mode="update")
    sink.upsert(b2, "blocks", runner.BLOCK_KEYS, mode="update")
    assert conn.execute("SELECT gas_used FROM blocks").fetchall() == [(9,)]


class _NoCloseConn:
    """sqlite shim: the sink closes per batch; keep the test DB open."""

    def __init__(self, conn):
        self._conn = conn

    def executemany(self, *a):
        return self._conn.executemany(*a)

    def commit(self):
        self._conn.commit()

    def close(self):
        pass


def test_monitoring_and_health(spark):
    stats = monitor.EngineStats()
    monitor.record_batch_heads(stats, fixtures.traces_df(spark), "trace")
    snap = stats.snapshot()
    assert snap["latest_trace_block_1"] >= 100

    server = monitor.start_health_server(stats, port=0)
    try:
        port = server.server_port
        assert (
            urllib.request.urlopen(f"http://127.0.0.1:{port}/").read()
            == b"Ok"
        )
        health = json.loads(
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health"
            ).read()
        )
        assert health["health"] == "ok"
        assert health["stats"]["latest_trace_block_1"] >= 100
    finally:
        server.shutdown()
