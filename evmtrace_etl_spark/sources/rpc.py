"""WS/RPC ingest feeders (S4–S6) and the retry policy (T4).

The reference's WebSocket path (src/consumer/ws/mod.rs:28-135)
subscribes to new heads (S4), re-fetches each block to fill
transaction_count/size (S5), and calls
``debug_traceBlockByNumber(callTracer, only_top_call=false)`` (S6),
retrying RPCs 5× with a constant 2 s backoff (ws/mod.rs:45-47).

This is ingestion-side connector code, not engine code (SURVEY §2.1) —
the engine boundary is a DataFrame of GETH_FRAMES_SCHEMA rows.  The
transport is injected (any ``(method, params) -> result`` callable:
an HTTP POST in production, a canned dict in tests); the WS subscription
(S4) lives in ``sources.ws`` — a stdlib RFC 6455 client re-exported
here as ``WsHeadSource``, tested against an in-process fake server.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..schemas import GETH_FRAMES_SCHEMA
from .ws import WsHeadSource  # noqa: F401  (S4, re-exported)

#: reference retry policy: 5 attempts, constant 2 s (ws/mod.rs:45-47)
RETRY_ATTEMPTS = 5
RETRY_BACKOFF_SECONDS = 2.0

#: settle delay before tracing a fresh head (ws/mod.rs:81)
TRACE_SETTLE_SECONDS = 1.0

Transport = Callable[[str, list], object]


def retry(
    fn: Callable[[], object],
    attempts: int = RETRY_ATTEMPTS,
    backoff_seconds: float = RETRY_BACKOFF_SECONDS,
    sleep: Callable[[float], None] = time.sleep,
):
    """T4 — constant-backoff retry; re-raises the last error."""
    last: Exception | None = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — connector boundary
            last = exc
            if i < attempts - 1:
                sleep(backoff_seconds)
    raise last  # type: ignore[misc]


class RpcClient:
    """Thin JSON-RPC wrapper over an injected transport."""

    def __init__(self, transport: Transport, sleep=time.sleep):
        self._call = transport
        self._sleep = sleep

    def get_block(self, number: int) -> dict:
        """S5 — fetch the full block (fills transaction_count/size and
        yields the tx hash list the tracer path needs)."""
        return retry(
            lambda: self._call("eth_getBlockByNumber", [hex(number), False]),
            sleep=self._sleep,
        )

    def trace_block(self, number: int) -> list[dict]:
        """S6 — debug_traceBlockByNumber with the callTracer and
        only_top_call=false (reference geth_trace.rs:17-30)."""
        params = [
            hex(number),
            {"tracer": "callTracer", "tracerConfig": {"onlyTopCall": False}},
        ]
        return retry(
            lambda: self._call("debug_traceBlockByNumber", params),
            sleep=self._sleep,
        )


__all__ = [
    "RETRY_ATTEMPTS",
    "RETRY_BACKOFF_SECONDS",
    "RpcClient",
    "WsHeadSource",
    "frames_to_df",
    "retry",
]


def frames_to_df(
    spark: SparkSession,
    chain_id: int,
    block: dict,
    traced: list[dict],
) -> DataFrame:
    """Feeder boundary: one traced block → GETH_FRAMES_SCHEMA rows.

    ``transaction_index`` is 1-based (i+1) exactly like the reference's
    WS path (ws/mod.rs:86-103); tx hashes come from the fetched block's
    ``transactions`` list.
    """
    tx_hashes = block.get("transactions", [])
    number = (
        int(block["number"], 16)
        if isinstance(block.get("number"), str)
        else block["number"]
    )
    ts = block.get("timestamp")
    ts = int(ts, 16) if isinstance(ts, str) else ts
    rows = [
        (
            chain_id,
            number,
            ts,
            block.get("hash"),
            tx_hashes[i] if i < len(tx_hashes) else None,
            i + 1,
            json.dumps(t.get("result", t), separators=(",", ":")),
        )
        for i, t in enumerate(traced)
    ]
    return spark.createDataFrame(rows, GETH_FRAMES_SCHEMA)
