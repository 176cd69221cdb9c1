"""T1 — true-streaming punctuation sessionizer via applyInPandasWithState.

Direct port of the reference's record-at-a-time session loop (reference
src/consumer/kafka/trace/mod.rs:53-80 + src/types/trace_tree.rs:247-312):
grouped by ``chain_id`` (the reference's unit of stream order — one Kafka
topic per chain), rows are processed in ``seq`` order; a root trace
(``trace_address == []``, P4) COMMITS the open session and starts a new
one.  Session state is the open tree's fused edge map — the same grain
``edge_aggregate`` produces in batch — so every closed session emits edge
rows plus its root row, and the existing relational derivations (rollup,
degrees, assembly) consume them unchanged.

Semantics notes:
- This path reproduces the reference EXACTLY where the batch groupBy
  intentionally diverges: a duplicate root starts a NEW session instead
  of merging (FIXTURES.md tx7 note), and the final session of a stream
  is never committed (no trailing punctuation).  The batch path remains
  the recommended one; this operator exists for record-order parity and
  as the engine's custom stateful-streaming exemplar (SURVEY §2.7).
- State per chain is one open session (bounded: edges of a single tx) —
  tiny, safe for the state store at any scale; groups are per chain, so
  parallelism follows the chain count exactly like the reference's
  task-per-topic model.
- API currency: Spark 4 adds ``transformWithStateInPandas`` (handle-
  based state over the RocksDB provider) as this operator's successor
  API; probed here and NOT adopted because its Python worker side
  requires ``google.protobuf``, which this environment does not ship
  (pip is unavailable).  ``applyInPandasWithState`` remains fully
  supported in Spark 4 and is the portable choice.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.evm import (
    EC_PAIRING_ADDRESS,
    EC_RECOVER_ADDRESS,
    FIRST_DEGREE_FILTER_ADDRESSES,
    ZERO_ADDRESS,
    ZERO_SELECTOR,
)

#: edge rows of committed sessions + one 'root' row per session that saw a
#: root trace (root payload as JSON for schema compactness)
SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("chain_id", T.LongType()),
        T.StructField("transaction_hash", T.StringType()),
        T.StructField("kind", T.StringType()),  # 'edge' | 'root'
        T.StructField("from_address", T.StringType()),
        T.StructField("to_address", T.StringType()),
        T.StructField("call_count", T.LongType()),
        T.StructField("gas_sum", T.LongType()),
        T.StructField("selectors", T.ArrayType(T.StringType())),
        T.StructField("pairing_sizes", T.ArrayType(T.IntegerType())),
        T.StructField("recovered", T.ArrayType(T.StringType())),
        T.StructField("root_json", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("tree", T.StringType())])


def _selector(inp: str | None, to: str | None) -> str:
    """P5/P6 in Python (trace_tree.rs:44-65): >4-byte calldata only, and
    masked to zero for first-degree precompile callees."""
    if to in FIRST_DEGREE_FILTER_ADDRESSES:
        return ZERO_SELECTOR
    if inp is None or len(inp) <= 10:
        return ZERO_SELECTOR
    return inp[:10]


def _recovered(output: str | None) -> str | None:
    """P7 (trace_tree.rs:287-301): short output → zero address."""
    if output is None:
        return None
    if (len(output) - 2) // 2 < 32:
        return ZERO_ADDRESS
    return "0x" + output[26:66]


def _new_tree() -> dict:
    return {"edges": {}, "root": None, "tx": None}


def _py(v):
    """Arrow/pandas scalar → JSON-safe Python native (NaN → None)."""
    if v is None:
        return None
    if isinstance(v, float):
        import math

        return None if math.isnan(v) else v
    if hasattr(v, "item"):  # numpy scalar
        return _py(v.item())
    return v


def _add_trace(tree: dict, row) -> None:
    """Port of TraceTree::add_trace (trace_tree.rs:247-303): update the
    fused edge map; record the root (trace_address == [])."""
    if len(row.trace_address) == 0:  # root: A6 first-trace capture
        tree["tx"] = _py(row.transaction_hash)
        tree["root"] = {
            k: _py(getattr(row, k))
            for k in (
                "transaction_index",
                "from_address",
                "to_address",
                "value_raw",
                "input",
                "gas_used",
                "error",
                "transaction_hash",
                "block_number",
                "block_timestamp",
                "block_hash",
                "seq",
            )
        }
    frm, to = _py(row.from_address), _py(row.to_address)
    if frm is None or to is None:  # P10 guard
        return
    tree["tx"] = tree["tx"] or _py(row.transaction_hash)
    key = f"{frm}|{to}"
    e = tree["edges"].setdefault(
        key, {"n": 0, "gas": 0, "sel": [], "psz": [], "rec": []}
    )
    e["n"] += 1
    gas = _py(row.gas_used)
    e["gas"] += int(gas) if gas is not None else 0
    sel = _selector(_py(row.input), to)
    if sel not in e["sel"]:
        e["sel"].append(sel)
    if to == EC_PAIRING_ADDRESS:
        inp = _py(row.input)
        e["psz"].append(0 if inp is None else (len(inp) - 2) // 2)
    if to == EC_RECOVER_ADDRESS:
        rec = _recovered(_py(row.output))
        if rec is not None and rec not in e["rec"]:
            e["rec"].append(rec)


def _commit_rows(chain_id: int, tree: dict) -> list[tuple]:
    """Emit the closed session: one edge row per pair + a root row.

    Sessions without a root are dropped: the reference builds its
    Transaction from the ROOT trace's fields (trace_tree.rs:72-89), so
    a rootless tree — only possible when a stream starts mid-transaction
    and sees child traces before the chain's first punctuation — commits
    nothing.  This matches session_edges_oracle_sql, which scopes edges
    to root-keyed sessions (pinned by test_sessionizer_mid_stream_start).
    """
    if tree["tx"] is None or tree["root"] is None:
        return []
    out = []
    for key, e in tree["edges"].items():
        frm, to = key.split("|")
        out.append(
            (
                chain_id, tree["tx"], "edge", frm, to, e["n"], e["gas"],
                sorted(e["sel"]), sorted(e["psz"]), sorted(e["rec"]), None,
            )
        )
    if tree["root"] is not None:
        out.append(
            (
                chain_id, tree["tx"], "root", None, None, None, None,
                None, None, None, json.dumps(tree["root"]),
            )
        )
    return out


def _run_session_loop(
    chain_id: int, batch: pd.DataFrame, tree: dict
) -> tuple[list[tuple], dict]:
    """The shared punctuation loop: returns (emitted rows, open tree)."""
    rows: list[tuple] = []
    batch = batch.sort_values("seq")  # stream order within the batch
    for row in batch.itertuples(index=False):
        if len(row.trace_address) == 0:
            # punctuation: commit previous session (trace/mod.rs:65-77)
            rows.extend(_commit_rows(chain_id, tree))
            tree = _new_tree()
        _add_trace(tree, row)
    return rows, tree


def _sessionize_stateful(
    key, pdfs: Iterator[pd.DataFrame], state
) -> Iterator[pd.DataFrame]:
    (chain_id,) = key
    tree = (
        json.loads(state.get[0])
        if state.exists and state.get[0]
        else _new_tree()
    )
    batch = pd.concat(list(pdfs), ignore_index=True)
    rows, tree = _run_session_loop(chain_id, batch, tree)
    state.update((json.dumps(tree),))
    yield pd.DataFrame(
        rows, columns=[f.name for f in SESSION_OUT_SCHEMA.fields]
    )


def sessionize_traces(traces: DataFrame) -> DataFrame:
    """Traces → committed-session edge/root rows.

    Streaming input: ``applyInPandasWithState`` — the open session
    persists in the state store across micro-batches.  Batch input: the
    identical loop one-shot via ``applyInPandas`` (Spark forbids the
    stateful form in batch queries)."""
    if traces.isStreaming:
        from pyspark.sql.streaming.state import GroupStateTimeout

        return traces.groupBy("chain_id").applyInPandasWithState(
            _sessionize_stateful,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def _one_shot(pdf: pd.DataFrame) -> pd.DataFrame:
        chain_id = int(pdf["chain_id"].iloc[0])
        rows, _open_tree = _run_session_loop(chain_id, pdf, _new_tree())
        return pd.DataFrame(
            rows, columns=[f.name for f in SESSION_OUT_SCHEMA.fields]
        )

    return traces.groupBy("chain_id").applyInPandas(
        _one_shot, schema=SESSION_OUT_SCHEMA
    )


def session_edges(out: DataFrame) -> DataFrame:
    """The committed edge rows, shaped like ``edge_aggregate`` output."""
    return out.filter(F.col("kind") == "edge").select(
        "chain_id",
        "transaction_hash",
        "from_address",
        "to_address",
        F.col("call_count"),
        F.col("gas_sum"),
        F.col("selectors"),
        F.col("pairing_sizes"),
        F.col("recovered"),
    )


def session_roots(out: DataFrame) -> DataFrame:
    """The committed root rows, parsed back to trace-root columns."""
    root_schema = T.StructType(
        [
            T.StructField("transaction_index", T.IntegerType()),
            T.StructField("from_address", T.StringType()),
            T.StructField("to_address", T.StringType()),
            T.StructField("value_raw", T.StringType()),
            T.StructField("input", T.StringType()),
            T.StructField("gas_used", T.LongType()),
            T.StructField("error", T.StringType()),
            T.StructField("transaction_hash", T.StringType()),
            T.StructField("block_number", T.LongType()),
            T.StructField("block_timestamp", T.LongType()),
            T.StructField("block_hash", T.StringType()),
            T.StructField("seq", T.LongType()),
        ]
    )
    return (
        out.filter(F.col("kind") == "root")
        .select(
            "chain_id", F.from_json("root_json", root_schema).alias("_r")
        )
        .select("chain_id", "_r.*")
        .withColumn("value", F.col("value_raw").cast("decimal(38,0)"))
    )
