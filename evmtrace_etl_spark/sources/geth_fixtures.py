"""Deterministic nested-callTracer fixtures for the Geth ingest path
(P3 flatten + P2 projection), shared by the Spark plan and the DuckDB
oracle (inline VALUES of the same JSON strings).

Shapes covered: depth-3 nesting, multi-child fan-out, a frame without
``to`` (CREATE), an errored frame, a leaf-only transaction, precompile
callees at depth 1 and 2, hex quantities for gas/gasUsed/value.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_A = {name: f"0x{name * 40}"[:42] for name in "abcdef"}
EC_RECOVER = "0x" + "0" * 39 + "1"
EC_PAIRING = "0x" + "0" * 39 + "8"


def _f(frm, to=None, typ="CALL", gas=0x5208, gas_used=0x5000, value=None,
       inp="0x", out=None, error=None, calls=None):
    d = {"from": frm, "type": typ, "gas": hex(gas), "gasUsed": hex(gas_used),
         "input": inp}
    if to is not None:
        d["to"] = to
    if value is not None:
        d["value"] = hex(value)
    if out is not None:
        d["output"] = out
    if error is not None:
        d["error"] = error
    if calls:
        d["calls"] = calls
    return d


#: tx 1: depth-3, ecRecover at depth 1 and ecPairing at depth 2, one
#: errored frame, one CREATE (no `to`)
_TX1 = _f(
    _A["a"], _A["b"], gas=0xF4240, gas_used=0xD6D8, value=0x38D7EA4C68000,
    inp="0xfeedf00dcafe", calls=[
        _f(_A["b"], EC_RECOVER, typ="STATICCALL", gas=0xBB8, gas_used=0xBB8,
           inp="0x" + "11" * 128,
           out="0x" + "00" * 12 + "ee" * 20),
        _f(_A["b"], _A["c"], typ="DELEGATECALL", gas=0x7530, gas_used=0x6000,
           inp="0xa1a2a3a4ffff", calls=[
               _f(_A["c"], EC_PAIRING, gas=0x2710, gas_used=0x2327,
                  inp="0x" + "22" * 192, out="0x" + "00" * 31 + "01"),
               _f(_A["c"], _A["d"], gas=0x1388, gas_used=0x1000,
                  error="execution reverted"),
           ]),
        _f(_A["b"], typ="CREATE", gas=0x9C40, gas_used=0x9000,
           inp="0x6060604052"),
    ])

#: tx 2: leaf-only root (no children)
_TX2 = _f(_A["e"], _A["f"], gas=0x5208, gas_used=0x5208, value=0xDE0B6B3A7640000)

#: tx 3: fan-out of 3 children, middle child has one nested call
_TX3 = _f(
    _A["d"], _A["a"], gas=0x30D40, gas_used=0x2BF20, inp="0xdeadbeef",
    calls=[
        _f(_A["a"], _A["b"], gas=0x2710, gas_used=0x2000),
        _f(_A["a"], _A["c"], gas=0x4E20, gas_used=0x4000, calls=[
            _f(_A["c"], EC_RECOVER, gas=0xBB8, gas_used=0xBB8,
               inp="0x" + "33" * 4,  # exactly-4-byte input (P5 quirk feed)
               out="0x" + "00" * 10),  # short output (P7 quirk feed)
        ]),
        _f(_A["a"], _A["e"], typ="STATICCALL", gas=0x1F40, gas_used=0x1D4C),
    ])

#: (chain_id, block_number, transaction_index, transaction_hash, frame_json)
#: transaction_index is 1-based on this ingest path (reference
#: src/consumer/ws/mod.rs:86-103 uses i+1 — quirk preserved and documented)
GETH_ROWS: list[tuple] = [
    (1, 500, 1, "0x" + "a1" * 32, json.dumps(_TX1, separators=(",", ":"))),
    (1, 500, 2, "0x" + "a2" * 32, json.dumps(_TX2, separators=(",", ":"))),
    (10, 900, 1, "0x" + "b1" * 32, json.dumps(_TX3, separators=(",", ":"))),
]

GETH_INPUT_SCHEMA = StructType(
    [
        StructField("chain_id", LongType(), False),
        StructField("block_number", LongType(), False),
        StructField("transaction_index", IntegerType(), False),
        StructField("transaction_hash", StringType(), False),
        StructField("frame_json", StringType(), False),
    ]
)


def geth_frames_df(spark: SparkSession) -> DataFrame:
    from .fixtures import arrow_df

    # coalesce(1): 3 rows over defaultParallelism partitions would spin an
    # (empty) Python worker per partition in the mapInPandas flatten
    return arrow_df(spark, GETH_ROWS, GETH_INPUT_SCHEMA).coalesce(1)


def geth_values_sql() -> str:
    """Inline VALUES relation of the same rows for the DuckDB oracle."""
    rows = ", ".join(
        "({}, {}, {}, '{}', '{}')".format(
            c, b, i, h, j.replace("'", "''")
        )
        for c, b, i, h, j in GETH_ROWS
    )
    return (
        "(VALUES "
        + rows
        + ") AS geth(chain_id, block_number, transaction_index, "
        "transaction_hash, frame_json)"
    )
