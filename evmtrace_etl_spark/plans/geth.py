"""Geth-ingest parity queries (P1/P2/P3): Spark mapInPandas flatten vs a
DuckDB recursive-CTE + JSON oracle over the same fixture trees.

The oracle reproduces the pre-order flatten relationally: a recursive CTE
unnests ``$.calls`` with ``generate_subscripts`` for the child index and
accumulates the ``trace_address`` path.  Order-insensitive compare makes
DFS order irrelevant; the path itself pins the tree structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.geth_ingest import flatten_call_frames, parity_project
from ..sources import geth_fixtures


def spark_geth_flatten(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    """P3+P2 flatten of the nested fixture, hash-safe projection
    (sf_dir unused: domain fixture is inline, like the zk queries)."""
    flat = flatten_call_frames(geth_fixtures.geth_frames_df(spark))
    return flat.select(
        "chain_id",
        "transaction_index",
        "from_address",
        "to_address",
        "value",
        "input",
        "output",
        "trace_type",
        "call_type",
        "gas",
        "gas_used",
        "subtraces",
        F.array_join(
            F.transform(F.col("trace_address"), lambda x: x.cast("string")),
            ",",
        ).alias("trace_address"),
        "error",
        "transaction_hash",
        "block_number",
    )


def _sql_hex_int(expr: str) -> str:
    """Hex-quantity (0x…) → BIGINT, same char-fold as the md5 hashes."""
    return (
        "list_reduce(list_transform(string_split_regex("
        f"replace(lower({expr}), '0x', ''), ''), "
        "c -> strpos('0123456789abcdef', c) - 1), (a,b) -> a*16 + b)"
    )


def geth_flatten_oracle_sql() -> str:
    return f"""
WITH RECURSIVE frames AS (
  SELECT chain_id, block_number, transaction_index, transaction_hash,
         frame_json AS fj, CAST([] AS INTEGER[]) AS path
  FROM {geth_fixtures.geth_values_sql()}
  UNION ALL
  SELECT f.chain_id, f.block_number, f.transaction_index,
         f.transaction_hash, els.el AS fj,
         list_append(f.path, CAST(els.idx - 1 AS INTEGER)) AS path
  FROM frames f,
       LATERAL (SELECT unnest(CAST(json_extract(f.fj, '$.calls[*]')
                                   AS VARCHAR[])) AS el,
                       generate_subscripts(CAST(json_extract(f.fj,
                                   '$.calls[*]') AS VARCHAR[]), 1) AS idx
               ) els
)
SELECT
  CAST(chain_id AS BIGINT) AS chain_id,
  CAST(transaction_index AS INTEGER) AS transaction_index,
  lower(json_extract_string(fj, '$.from')) AS from_address,
  lower(json_extract_string(fj, '$.to')) AS to_address,
  CAST({_sql_hex_int("json_extract_string(fj, '$.value')")} AS VARCHAR)
    AS value,
  json_extract_string(fj, '$.input') AS input,
  json_extract_string(fj, '$.output') AS output,
  'call' AS trace_type,
  lower(json_extract_string(fj, '$.type')) AS call_type,
  CAST({_sql_hex_int("json_extract_string(fj, '$.gas')")} AS BIGINT) AS gas,
  CAST({_sql_hex_int("json_extract_string(fj, '$.gasUsed')")} AS BIGINT)
    AS gas_used,
  CAST(coalesce(json_array_length(fj, '$.calls'), 0) AS INTEGER)
    AS subtraces,
  coalesce(array_to_string(path, ','), '') AS trace_address,
  json_extract_string(fj, '$.error') AS error,
  transaction_hash,
  CAST(block_number AS BIGINT) AS block_number
FROM frames
"""


# ---------------------------------------------------------------------------
# P1 parity projection: mixed-action fixture, non-Call rows must drop
# ---------------------------------------------------------------------------

#: (chain_id, trace_type, call_type, from_address, to_address, gas_used)
PARITY_ROWS: list[tuple] = [
    (1, "call", "Call", "0x" + "aa" * 20, "0x" + "bb" * 20, 21000),
    (1, "call", "DelegateCall", "0x" + "bb" * 20, "0x" + "cc" * 20, 9000),
    (1, "call", "StaticCall", "0x" + "cc" * 20, "0x" + "dd" * 20, 4000),
    (1, "suicide", None, "0x" + "dd" * 20, None, 0),
    (1, "reward", None, None, "0x" + "ee" * 20, 0),
    (1, "create", None, "0x" + "ee" * 20, None, 53000),
    (2, "CALL", "CALLCODE", "0x" + "ff" * 20, "0x" + "aa" * 20, 700),
]

PARITY_SCHEMA = StructType(
    [
        StructField("chain_id", LongType(), False),
        StructField("trace_type", StringType(), False),
        StructField("call_type", StringType(), True),
        StructField("from_address", StringType(), True),
        StructField("to_address", StringType(), True),
        StructField("gas_used", LongType(), False),
    ]
)


def spark_parity_project(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    from ..sources.fixtures import arrow_df

    return parity_project(arrow_df(spark, PARITY_ROWS, PARITY_SCHEMA))


def parity_project_oracle_sql() -> str:
    def lit(v):
        return "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))

    rows = ", ".join(
        "(" + ", ".join(lit(v) for v in row) + ")" for row in PARITY_ROWS
    )
    return f"""
WITH t AS (
  SELECT * FROM (VALUES {rows})
  AS t(chain_id, trace_type, call_type, from_address, to_address, gas_used)
)
SELECT CAST(chain_id AS BIGINT) AS chain_id, trace_type,
       lower(call_type) AS call_type, from_address, to_address,
       CAST(gas_used AS BIGINT) AS gas_used
FROM t WHERE lower(trace_type) = 'call'
"""


QUERIES = {
    "zk_geth_flatten": spark_geth_flatten,
    "zk_parity_project": spark_parity_project,
}

ORACLES = {
    "zk_geth_flatten": geth_flatten_oracle_sql(),
    "zk_parity_project": parity_project_oracle_sql(),
}
