"""Geth callTracer ingest: recursive call-frame flatten (P3) and frame →
Trace projection (P2), plus the parity-style projection (P1).

The reference flattens nested ``CallFrame`` trees in pre-order DFS with a
materialized child-index path (``trace_address``) and ``subtraces`` =
direct child count (reference src/types/geth_trace.rs:46-83), then
projects each frame to a flat Trace (src/types/trace.rs:82-112 —
``trace_type='call'``, lowercased ``call_type``, absent ``to`` allowed).

Spark has no recursive explode, so the flatten is an Arrow-batched
``mapInPandas`` over the raw JSON payloads (SURVEY §2.7) — a narrow,
shuffle-free transformation: each input row (one transaction's frame
tree) expands to its frame count independently, so it parallelizes
per-partition at any scale.  Everything downstream is the relational
zk pipeline, unchanged.

Quirk preserved: this ingest path's ``transaction_index`` is 1-based
(reference ws/mod.rs:86-103 uses ``i + 1``; the Kafka path is 0-based).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FLAT_TRACE_SCHEMA = StructType(
    [
        StructField("chain_id", LongType()),
        StructField("transaction_index", IntegerType()),
        StructField("from_address", StringType()),
        StructField("to_address", StringType()),
        StructField("value", StringType()),  # decimal string (U256-safe)
        StructField("input", StringType()),
        StructField("output", StringType()),
        StructField("trace_type", StringType()),
        StructField("call_type", StringType()),
        StructField("gas", LongType()),
        StructField("gas_used", LongType()),
        StructField("subtraces", IntegerType()),
        StructField("trace_address", ArrayType(IntegerType())),
        StructField("error", StringType()),
        StructField("transaction_hash", StringType()),
        StructField("block_number", LongType()),
    ]
)


def _hex_int(v: str | None) -> int | None:
    return int(v, 16) if v is not None else None


def _flatten_tree(frame: dict) -> list[tuple[dict, int, list[int]]]:
    """Pre-order DFS: (frame, subtraces, trace_address) per frame — root
    first with path [], child i appends i (geth_trace.rs:46-83)."""
    out: list[tuple[dict, int, list[int]]] = []

    def walk(fr: dict, path: list[int]) -> None:
        calls = fr.get("calls") or []
        out.append((fr, len(calls), path))
        for i, child in enumerate(calls):
            walk(child, path + [i])

    walk(frame, [])
    return out


def flatten_call_frames(frames: DataFrame) -> DataFrame:
    """P3 + P2: (chain_id, block_number, transaction_index,
    transaction_hash, frame_json) → flat Trace rows."""

    def _expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                for fr, n_sub, path in _flatten_tree(json.loads(rec.frame_json)):
                    value = _hex_int(fr.get("value"))
                    rows.append(
                        {
                            "chain_id": rec.chain_id,
                            "transaction_index": rec.transaction_index,
                            "from_address": fr.get("from", "").lower() or None,
                            "to_address": (fr.get("to") or "").lower() or None,
                            "value": str(value) if value is not None else None,
                            "input": fr.get("input"),
                            "output": fr.get("output"),
                            "trace_type": "call",
                            "call_type": fr.get("type", "").lower() or None,
                            "gas": _hex_int(fr.get("gas")),
                            "gas_used": _hex_int(fr.get("gasUsed")),
                            "subtraces": n_sub,
                            "trace_address": path,
                            "error": fr.get("error"),
                            "transaction_hash": rec.transaction_hash,
                            "block_number": rec.block_number,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FLAT_TRACE_SCHEMA.fields]
            )

    return frames.mapInPandas(_expand, schema=FLAT_TRACE_SCHEMA)


def flattened_to_traces(flat: DataFrame) -> DataFrame:
    """Adapt the flattened Geth frames to TRACE_SCHEMA so the zk pipeline
    (EP1's relational core) consumes the WS/Geth ingest path unchanged —
    the reference feeds both paths into the same TraceTree
    (kafka/trace/mod.rs:62 vs ws/mod.rs:104-114).

    ``seq`` is constant: the Geth path cannot produce duplicate roots for
    one (chain, tx) — each tx appears once per traced block.
    """
    return flat.select(
        "chain_id",
        "transaction_index",
        "from_address",
        "to_address",
        F.col("value").cast("decimal(38,0)").alias("value"),
        F.col("value").alias("value_raw"),
        "input",
        "output",
        "trace_type",
        "call_type",
        F.lit(None).cast("string").alias("reward_type"),
        "gas",
        "gas_used",
        "subtraces",
        "trace_address",
        "error",
        "transaction_hash",
        "block_number",
        F.lit(None).cast("long").alias("block_timestamp"),
        F.lit(None).cast("string").alias("block_hash"),
        F.lit(0).cast("long").alias("seq"),
    )


def parity_project(traces: DataFrame) -> DataFrame:
    """P1 — parity-style trace normalization (reference
    src/types/trace.rs:113-164): keep only Call-action traces, lowercase
    the call type; non-Call actions (suicide/reward/create) drop."""
    return traces.filter(F.lower(F.col("trace_type")) == "call").withColumn(
        "call_type", F.lower(F.col("call_type"))
    )
