"""Explicit StructTypes for the domain data model (SURVEY §1).

The reference declares fixed, compile-time schemas via serde structs
(reference src/types/trace.rs:12-42, src/types/block.rs:8-22,
src/types/etl_result.rs:17-68).  We mirror them as explicit StructTypes and
never rely on schema inference — streaming JSON decode uses
``from_json(col, TRACE_SCHEMA)``.

Representation choices (SURVEY §1.2):
- addresses / hashes / selectors: lowercase ``0x…`` hex strings internally;
  EIP-55 checksumming is applied only at the sink (reference
  src/types/etl_result.rs:166-172).
- wei values: DecimalType(38,0) — matches the reference's decimal-string
  serde for U256 (src/types/trace.rs:44-63).  38 digits covers ~1e20 ether;
  callers needing full 2^256 keep the raw string column.
- ``trace_address``: array<int> — the pre-order DFS path; ``[]`` marks the
  transaction root (P4).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Inputs
# ---------------------------------------------------------------------------

#: Flattened EVM call frame (reference src/types/trace.rs:12-42) + chain_id
#: + seq (explicit arrival order; replaces stream order for keep-last dedup —
#: monotonically_increasing_id is only per-partition monotonic, so the order
#: column must come from the source: Kafka offset, or a fixture column).
TRACE_SCHEMA = T.StructType(
    [
        T.StructField("chain_id", T.LongType(), False),
        T.StructField("transaction_index", T.IntegerType(), True),
        T.StructField("from_address", T.StringType(), True),
        T.StructField("to_address", T.StringType(), True),
        T.StructField("value", T.DecimalType(38, 0), True),
        # the documented U256 escape hatch: the wire decimal string,
        # preserved verbatim (values ≥ 1e38 wei overflow DecimalType(38,0)
        # to null; the raw column keeps full 2^256 fidelity)
        T.StructField("value_raw", T.StringType(), True),
        T.StructField("input", T.StringType(), True),
        T.StructField("output", T.StringType(), True),
        T.StructField("trace_type", T.StringType(), True),
        T.StructField("call_type", T.StringType(), True),
        T.StructField("reward_type", T.StringType(), True),
        T.StructField("gas", T.LongType(), True),
        T.StructField("gas_used", T.LongType(), True),
        T.StructField("subtraces", T.IntegerType(), False),
        T.StructField("trace_address", T.ArrayType(T.IntegerType()), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("transaction_hash", T.StringType(), True),
        T.StructField("block_number", T.LongType(), False),
        T.StructField("block_timestamp", T.LongType(), True),
        T.StructField("block_hash", T.StringType(), True),
        T.StructField("seq", T.LongType(), False),
    ]
)

#: Block header (reference src/types/block.rs:8-22) + chain_id.
BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("chain_id", T.LongType(), False),
        T.StructField("number", T.LongType(), False),
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("hash", T.StringType(), False),
        T.StructField("parent_hash", T.StringType(), False),
        T.StructField("transaction_count", T.IntegerType(), False),
        T.StructField("nonce", T.StringType(), False),
        T.StructField("miner", T.StringType(), False),
        T.StructField("difficulty", T.LongType(), False),
        T.StructField("total_difficulty", T.DoubleType(), False),
        T.StructField("size", T.IntegerType(), False),
        T.StructField("gas_limit", T.LongType(), False),
        T.StructField("gas_used", T.LongType(), False),
        T.StructField("base_fee_per_gas", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Outputs (reference src/types/etl_result.rs:17-68; sink column order from the
# INSERT statements at etl_result.rs:153-159, 213-216, 267-281)
# ---------------------------------------------------------------------------

TRANSACTION_SCHEMA = T.StructType(
    [
        T.StructField("chain_id", T.LongType(), False),
        T.StructField("transaction_hash", T.StringType(), False),
        T.StructField("from_address", T.StringType(), False),
        T.StructField("to_address", T.StringType(), False),
        T.StructField("closest_address", T.ArrayType(T.StringType()), False),
        T.StructField("function_signature", T.StringType(), False),
        T.StructField("transaction_index", T.IntegerType(), False),
        T.StructField("block_number", T.LongType(), False),
        T.StructField("block_timestamp", T.LongType(), True),
        T.StructField("block_hash", T.StringType(), True),
        T.StructField("value", T.DecimalType(38, 0), False),
        T.StructField("input", T.StringType(), False),
        T.StructField("gas_used_total", T.LongType(), False),
        T.StructField("gas_used_first_degree", T.LongType(), False),
        T.StructField("gas_used_second_degree", T.LongType(), False),
        T.StructField("ec_recover_count", T.LongType(), False),
        T.StructField("ec_add_count", T.LongType(), False),
        T.StructField("ec_mul_count", T.LongType(), False),
        T.StructField("ec_pairing_count", T.LongType(), False),
        T.StructField("ec_pairing_input_sizes", T.ArrayType(T.IntegerType()), False),
        T.StructField("ec_recover_addresses", T.ArrayType(T.StringType()), False),
        T.StructField("error", T.StringType(), True),
    ]
)

CONTRACT_SCHEMA = T.StructType(
    [
        T.StructField("chain_id", T.LongType(), False),
        T.StructField("address", T.StringType(), False),
        T.StructField("function_signatures", T.ArrayType(T.StringType()), False),
        T.StructField("degree", T.IntegerType(), False),
        T.StructField("ec_recover_count", T.LongType(), False),
        T.StructField("ec_add_count", T.LongType(), False),
        T.StructField("ec_mul_count", T.LongType(), False),
        T.StructField("ec_pairing_count", T.LongType(), False),
        T.StructField("ec_pairing_input_sizes", T.ArrayType(T.IntegerType()), False),
        T.StructField("call", T.ArrayType(T.StringType()), False),
    ]
)

#: blocks output = BLOCK_SCHEMA minus seq (passthrough, EP2).
BLOCK_OUT_SCHEMA = T.StructType([f for f in BLOCK_SCHEMA.fields if f.name != "seq"])

#: Nested Geth callTracer frame, carried as a JSON string column because
#: Spark StructTypes cannot be recursive (reference src/types/geth_trace.rs).
GETH_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("chain_id", T.LongType(), False),
        T.StructField("block_number", T.LongType(), False),
        T.StructField("block_timestamp", T.LongType(), True),
        T.StructField("block_hash", T.StringType(), True),
        T.StructField("transaction_hash", T.StringType(), False),
        T.StructField("transaction_index", T.IntegerType(), False),
        T.StructField("frame_json", T.StringType(), False),
    ]
)
