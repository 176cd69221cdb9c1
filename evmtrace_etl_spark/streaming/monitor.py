"""Observability tier (T6 monitoring aggregates, T7 health endpoint).

The reference keeps a stats map (max block per chain, last Kafka offset
per topic, queue length — src/api/stats.rs:37-78) and serves it at
``GET /health`` (src/api/mod.rs:13-27).  Spark equivalents: a
``StreamingQueryListener`` capturing per-query progress, a tiny
``max(block_number) per chain`` aggregate runnable on any batch, and a
stdlib HTTP thread on the driver.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


class EngineStats:
    """Thread-safe stats map (reference STATS, api/stats.rs:21-35)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._stats: dict[str, object] = {}

    def update(self, **kv: object) -> None:
        with self._lock:
            self._stats.update(kv)

    def snapshot(self) -> dict[str, object]:
        with self._lock:
            return dict(self._stats)


def max_block_by_chain(df: DataFrame, block_col: str = "block_number") -> DataFrame:
    """T6 — running sync head per chain (reference stats.rs:43-60)."""
    return df.groupBy("chain_id").agg(
        F.max(F.col(block_col)).alias("latest_block")
    )


def record_batch_heads(
    stats: EngineStats, batch: DataFrame, kind: str,
    block_col: str = "block_number",
) -> None:
    for row in max_block_by_chain(batch, block_col).collect():
        stats.update(**{f"latest_{kind}_block_{row['chain_id']}": row["latest_block"]})


def record_maintenance(stats: EngineStats, prefix: str = "maintain"):
    """Adapter for the lake sinks' ``on_maintain`` hook: returns a
    callback that folds each in-band ``maintain_table`` ledger into the
    T6 stats map, so ``GET /health`` (T7) shows that a long-running
    stream is actually bounding its file/tombstone debt — which batch
    last maintained, at what table version, what each step did, and how
    much DV debt was observed.  Without this the ledger returns into
    the foreachBatch closure and is dropped."""

    def _on_maintain(ledger: dict) -> None:
        actions = ledger.get("actions") or {}

        def _summ(step) -> dict | None:
            if step is None:
                return None
            if isinstance(step, list):  # vacuum returns removed paths
                return {"removed": len(step)}
            return {
                k: step[k]
                for k in (
                    "files_rewritten", "files_added", "rows_suppressed",
                    "dv_files_removed", "version",
                )
                if k in step
            }

        stats.update(
            **{
                f"last_{prefix}_batch": ledger.get("batch_id"),
                f"last_{prefix}_version": ledger.get("version"),
                f"last_{prefix}_dv_files": actions.get("dv_files"),
                f"last_{prefix}_dv_rows": actions.get("dv_rows"),
                f"last_{prefix}_actions": {
                    step: _summ(actions.get(step))
                    for step in ("materialize", "compact", "vacuum")
                },
            }
        )

    return _on_maintain


class ProgressListener(StreamingQueryListener):
    """Captures streaming progress into EngineStats (replaces the
    reference's offset map; offsets live in query progress here)."""

    def __init__(self, stats: EngineStats) -> None:
        self.stats = stats

    def onQueryStarted(self, event) -> None:  # noqa: N802
        self.stats.update(**{f"query_{event.id}": "started"})

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.stats.update(
            **{
                f"query_{p.id}_batch": p.batchId,
                f"query_{p.id}_rows_per_sec": p.processedRowsPerSecond,
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.stats.update(**{f"query_{event.id}": "terminated"})

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


def start_health_server(stats: EngineStats, port: int = 0):
    """T7 — ``GET /`` → "Ok"; ``GET /health`` → JSON health+stats
    (reference api/mod.rs:13-27).  Returns the server (``server_port``
    carries the bound port); call ``shutdown()`` to stop."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            if self.path == "/":
                body, ctype = b"Ok", "text/plain"
            elif self.path == "/health":
                body = json.dumps(
                    {"health": "ok", "stats": stats.snapshot()}
                ).encode()
                ctype = "application/json"
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # silence request logging
            pass

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
