"""Sink/streaming-tier parity queries — the S-tier and T-tier as
driver-checkable rows, not just local tests.

Each query drives REAL side-effecting machinery (file-source structured
stream, ``foreachBatch``, the versioned parquet upsert sink) end-to-end
inside the ``queries()`` callable and returns the final sink table; the
DuckDB oracle expresses the equivalent batch semantics:

- ``zk_stream_transactions`` — S3 (strict-schema file stream) + T1–T3
  (micro-batch sessionization, availableNow trigger, checkpoint) + S7/S9
  (foreachBatch fan-out into the upsert sink).  A single availableNow
  pass over the fixture must equal the pure-batch pipeline, so the
  oracle is the zk_transactions SQL (reference EP1,
  src/consumer/kafka/trace/mod.rs:53-80 → src/dumper/postgres.rs:41-92).
- ``zk_upsert_replay`` — S8/D4 cross-batch dedup via insert-if-absent:
  batch 1 = chain-1 traces, batch 2 = a full replay.  Keys already
  inserted are skipped (the reference's Redis GET + ON CONFLICT DO
  NOTHING, src/dumper/postgres.rs:53-66, etl_result.rs:159), so the
  final table equals the one-shot batch result.
- ``zk_upsert_blocks`` — D3/D5 keep-last across two micro-batches with
  DO-UPDATE semantics (etl_result.rs:267-281): the later batch's
  duplicate (chain_id, number) rows overwrite the earlier batch's.

EIP-55 checksumming (P9) is disabled on these paths because the oracle
is pure SQL; the checksum leg is covered by unit vectors in
tests/test_keccak_batch.py and the streaming tests.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..sinks import ParquetUpsertSink
from ..sources import fixtures
from ..streaming import runner, sources
from . import zk_parity


def _workdir(name: str) -> str:
    """Deterministic per-query scratch dir, recreated on every call so
    repeated driver runs do not accumulate state."""
    base = os.path.join(tempfile.gettempdir(), f"evmtrace_{name}")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    return base


def spark_stream_transactions(
    spark: SparkSession, sf_dir: str = ""
) -> DataFrame:
    """Fixture → JSON files → structured stream → foreachBatch zk pipeline
    → parquet upsert sink → final transactions table."""
    base = _workdir("stream_tx")
    src = os.path.join(base, "src")
    fixtures.traces_df(spark).coalesce(1).write.json(src)
    sink = ParquetUpsertSink(os.path.join(base, "sink"))

    def _process(batch: DataFrame, _batch_id: int) -> None:
        runner.process_trace_batch(batch, sink, checksum=False)

    q = (
        sources.file_trace_stream(spark, src)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        # availableNow should always terminate; a hang would otherwise
        # surface as a confusing partial-sink oracle mismatch
        q.stop()
        raise TimeoutError(
            "zk_stream_transactions: stream not finished after 120 s"
        )
    return zk_parity.project_tx(sink.read(spark, "transactions"))


def spark_upsert_replay(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    """Two foreachBatch cycles: chain-1 traces, then a full replay.  The
    insert-if-absent sink must keep the first insert of every key."""
    base = _workdir("upsert_replay")
    sink = ParquetUpsertSink(os.path.join(base, "sink"))
    traces = fixtures.traces_df(spark)
    runner.process_trace_batch(
        traces.filter("chain_id = 1"), sink, checksum=False
    )
    runner.process_trace_batch(traces, sink, checksum=False)
    return zk_parity.project_tx(sink.read(spark, "transactions"))


def spark_upsert_blocks(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    """Two block micro-batches with a cross-batch duplicate (chain 1,
    block 100): DO-UPDATE upsert keeps the later batch's row."""
    base = _workdir("upsert_blocks")
    sink = ParquetUpsertSink(os.path.join(base, "sink"))
    blocks = fixtures.blocks_df(spark)
    runner.process_block_batch(
        blocks.filter("seq <= 2"), sink, checksum=False
    )
    runner.process_block_batch(
        blocks.filter("seq >= 3"), sink, checksum=False
    )
    return sink.read(spark, "blocks")


QUERIES = {
    "zk_stream_transactions": spark_stream_transactions,
    "zk_upsert_replay": spark_upsert_replay,
    "zk_upsert_blocks": spark_upsert_blocks,
}

ORACLES = {
    "zk_stream_transactions": zk_parity.zk_transactions_oracle_sql(),
    "zk_upsert_replay": zk_parity.zk_transactions_oracle_sql(),
    "zk_upsert_blocks": zk_parity.blocks_oracle_sql(),
}
