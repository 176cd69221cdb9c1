"""Streaming sources (S1–S4): Kafka and file streams decoded with strict
schemas — ``from_json`` + explicit StructType, never inference
(reference decodes with serde_json into fixed structs,
src/consumer/kafka/mod.rs:41-50).

CI stand-in policy: this environment ships neither a Kafka broker nor
the spark-sql-kafka connector jar, so ``file_trace_stream`` /
``file_block_stream`` are the PERMANENT CI stand-ins for S1/S2 — same
strict-schema decode, same downstream foreachBatch plan, same
checkpoint/idempotency semantics; only the source format string
differs.  ``kafka_trace_stream`` is smoke-tested when
``EVMTRACE_KAFKA_BOOTSTRAP`` points at a reachable broker (see
tests/test_streaming.py::test_kafka_stream_smoke) and is otherwise a
documented skip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import BLOCK_SCHEMA, TRACE_SCHEMA


def _payload_schema(schema: T.StructType) -> T.StructType:
    """Wire payloads carry neither chain_id (topic-implied, reference
    config.rs:98-114) nor seq (assigned from the Kafka offset)."""
    return T.StructType(
        [f for f in schema.fields if f.name not in ("chain_id", "seq")]
    )


TRACE_PAYLOAD_SCHEMA = _payload_schema(TRACE_SCHEMA)
BLOCK_PAYLOAD_SCHEMA = _payload_schema(BLOCK_SCHEMA)


def _decode_marked(
    raw: DataFrame,
    payload: T.StructType,
    value_col: str,
    seq_col: str | None,
) -> DataFrame:
    return raw.select(
        F.col(value_col).cast("string").alias("_raw"),
        F.from_json(F.col(value_col).cast("string"), payload).alias("_r"),
        *( [F.col(seq_col).cast("long").alias("seq")] if seq_col else [] ),
    )


def _project_decoded(
    decoded: DataFrame,
    payload: T.StructType,
    schema: T.StructType,
    chain_id: int,
    seq_col: str | None,
) -> DataFrame:
    cols = [
        # value_raw: the wire decimal string verbatim (U256 escape hatch —
        # DecimalType(38,0) would null out values ≥ 1e38 wei)
        F.get_json_object(F.col("_raw"), "$.value").alias("value_raw")
        if f.name == "value_raw"
        else F.col(f"_r.{f.name}").alias(f.name)
        for f in payload.fields
    ]
    out = decoded.select(
        F.lit(chain_id).cast("long").alias("chain_id"),
        *cols,
        *( [F.col("seq")] if seq_col else [F.lit(0).cast("long").alias("seq")] ),
    )
    # restore canonical column order
    return out.select(*[f.name for f in schema.fields])


def decode_payloads(
    raw: DataFrame,
    schema: T.StructType,
    chain_id: int,
    value_col: str = "value",
    seq_col: str | None = "offset",
) -> DataFrame:
    """S3 — bytes → typed rows: strict-schema JSON decode, chain_id from
    the topic binding, seq from the Kafka offset (the explicit arrival
    order the keep-last dedups need)."""
    payload = _payload_schema(schema)
    decoded = _decode_marked(raw, payload, value_col, seq_col)
    return _project_decoded(decoded, payload, schema, chain_id, seq_col)


def decode_payloads_split(
    raw: DataFrame,
    schema: T.StructType,
    chain_id: int,
    value_col: str = "value",
    seq_col: str | None = "offset",
) -> tuple[DataFrame, DataFrame]:
    """S3 with bad-record routing: returns ``(good, quarantine)``.

    Malformed payloads are detected the canonical Spark way — a
    ``columnNameOfCorruptRecord`` field added to the parse schema
    (PERMISSIVE ``from_json`` otherwise returns an all-null struct, not
    a null one).  The reference's serde error path skips such records
    silently (kafka/mod.rs:47-49); routing them to a quarantine output
    instead (raw payload + chain_id + seq) preserves them for
    audit/replay — the bad-record sideline every production ingest
    needs.  Both outputs share the single decode projection; the split
    is two narrow filters over it.
    """
    payload = _payload_schema(schema)
    probe = T.StructType(
        list(payload.fields) + [T.StructField("_corrupt", T.StringType())]
    )
    decoded = raw.select(
        F.col(value_col).cast("string").alias("_raw"),
        F.from_json(
            F.col(value_col).cast("string"),
            probe,
            {"columnNameOfCorruptRecord": "_corrupt"},
        ).alias("_r"),
        *(
            [F.col(seq_col).cast("long").alias("seq")]
            if seq_col
            else []
        ),
    )
    is_bad = F.col("_r").isNull() | F.col("_r._corrupt").isNotNull()
    good = _project_decoded(
        decoded.filter(~is_bad), payload, schema, chain_id, seq_col
    )
    quarantine = decoded.filter(is_bad).select(
        F.lit(chain_id).cast("long").alias("chain_id"),
        F.col("_raw").alias("raw_payload"),
        *(
            [F.col("seq")]
            if seq_col
            else [F.lit(0).cast("long").alias("seq")]
        ),
    )
    return good, quarantine


def kafka_trace_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    chain_id: int,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 100_000,
) -> DataFrame:
    """S1 — one topic per chain (reference kafka/trace/mod.rs:24-51).
    ``maxOffsetsPerTrigger`` plays the reference's 100k-row flush bound
    (main.rs:105) as source-side backpressure."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option(
            "maxOffsetsPerTrigger", str(max_offsets_per_trigger)
        )
    return decode_payloads(reader.load(), TRACE_SCHEMA, chain_id)


def kafka_block_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    chain_id: int,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S2 — block topic consumer (reference kafka/block.rs:24-51)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return decode_payloads(raw, BLOCK_SCHEMA, chain_id)


def file_trace_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based trace stream (full TRACE_SCHEMA JSON lines) — the local
    stand-in for S1 used by the streaming smoke tests; same downstream
    plan as the Kafka path.  ``max_files_per_trigger`` is the file-source
    analog of Kafka's ``maxOffsetsPerTrigger`` (T2 pacing): it bounds each
    micro-batch, so ``availableNow`` drains the backlog in several paced
    batches instead of one."""
    reader = spark.readStream.schema(TRACE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def file_block_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(BLOCK_SCHEMA).json(path)
