"""Structured Streaming wiring around the batch core: sources (S1–S4),
the checkpointed foreachBatch runner (T2/T3, S9), the stateful
punctuation sessionizer (T1), and monitoring/health (T6/T7)."""

from .monitor import (
    EngineStats,
    ProgressListener,
    max_block_by_chain,
    start_health_server,
)
from .runner import (
    process_block_batch,
    process_trace_batch,
    start_block_stream,
    start_zk_stream,
)
from .sessionizer import session_edges, session_roots, sessionize_traces
from .sources import (
    decode_payloads,
    file_block_stream,
    file_trace_stream,
    kafka_block_stream,
    kafka_trace_stream,
)

__all__ = [
    "EngineStats",
    "ProgressListener",
    "max_block_by_chain",
    "start_health_server",
    "process_block_batch",
    "process_trace_batch",
    "start_block_stream",
    "start_zk_stream",
    "session_edges",
    "session_roots",
    "sessionize_traces",
    "decode_payloads",
    "file_block_stream",
    "file_trace_stream",
    "kafka_block_stream",
    "kafka_trace_stream",
]
