"""Observability surface for the streaming pipeline (SURVEY.md §2 A17
adjacent; VERDICT "What's missing" #5).

The reference exposes `GET /healthz` plus structured logs per batch
(publisher/cmd/api/main.go:76-80; consumer batch logging in
MessageProcessor.kt:33-52). The honest Spark analog is a
StreamingQueryListener: Spark already computes per-batch progress
(rows, durations, sources) — the listener turns that into

- a liveness/health answer (`health()`): is every tracked query alive,
  progressing, and exception-free?
- throughput counters (`snapshot()`): total rows, batches, rows/sec of
  the last batch per query.
- an optional JSONL metrics log, one line per micro-batch — the
  scrape-friendly shape a Prometheus exporter or log shipper tails.

Listener callbacks run on Spark's listener bus thread, so handlers stay
allocation-light and never touch DataFrames (that would deadlock the
bus at scale).
"""

from __future__ import annotations

import json
import threading
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener


class PipelineMetricsListener(StreamingQueryListener):
    """Collects per-query progress; thread-safe snapshot/health reads.

    Attach with ``spark.streams.addListener(listener)`` BEFORE starting
    the query; detach with ``removeListener`` when done (tests do both).
    """

    def __init__(self, log_path: str | None = None) -> None:
        self._lock = threading.Lock()
        self._queries: dict[str, dict[str, Any]] = {}
        self._log_path = log_path

    # -- listener callbacks -------------------------------------------------
    # Spark hands back event.id as uuid.UUID in started/idle/terminated
    # but progress.id stringifies differently — normalize every callback
    # to str so a query has exactly one entry (counters and terminal
    # status land on the same key).
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._queries[str(event.id)] = {
                "name": event.name,
                "status": "running",
                "batches": 0,
                "total_rows": 0,
                "last_rows_per_sec": 0.0,
                "last_batch_duration_ms": None,
                "error": None,
            }

    def onQueryProgress(self, event) -> None:
        p = event.progress
        with self._lock:
            q = self._queries.setdefault(str(p.id), {"status": "running"})
            q["batches"] = q.get("batches", 0) + 1
            q["total_rows"] = q.get("total_rows", 0) + int(p.numInputRows)
            q["last_rows_per_sec"] = float(p.processedRowsPerSecond or 0.0)
            q["last_batch_duration_ms"] = (p.durationMs or {}).get("triggerExecution")
        if self._log_path:
            line = json.dumps(
                {
                    "query_id": str(p.id),
                    "batch_id": p.batchId,
                    "num_input_rows": int(p.numInputRows),
                    "processed_rows_per_sec": float(p.processedRowsPerSecond or 0.0),
                    "duration_ms": (p.durationMs or {}).get("triggerExecution"),
                }
            )
            with self._lock:
                with open(self._log_path, "a") as fh:
                    fh.write(line + "\n")

    def onQueryIdle(self, event) -> None:
        with self._lock:
            if str(event.id) in self._queries:
                self._queries[str(event.id)]["status"] = "idle"

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            q = self._queries.setdefault(str(event.id), {})
            q["status"] = "failed" if event.exception else "terminated"
            q["error"] = event.exception

    # -- read side ----------------------------------------------------------
    def snapshot(self) -> dict[str, dict[str, Any]]:
        with self._lock:
            return {k: dict(v) for k, v in self._queries.items()}

    def health(self) -> dict[str, Any]:
        """The /healthz answer: ok iff no tracked query died with an
        exception. A cleanly-stopped query (drain/shutdown, A17) stays
        healthy — matching the reference, whose healthz only reports
        process liveness, not work completion."""
        snap = self.snapshot()
        failed = {k: v["error"] for k, v in snap.items() if v.get("status") == "failed"}
        return {
            "status": "error" if failed else "ok",
            "n_queries": len(snap),
            "failed": failed,
        }
