"""Streaming observability: a per-batch metrics listener.

The reference runs its streams blind — no progress, rate or state-size
signal anywhere (`Task2.py`–`Task4.py` just ``awaitTermination()``). At
100 TB the FIRST operational requirement is seeing each micro-batch's
input rows, processing rate, duration and state size, because that is how
watermark lag, state growth and trigger backpressure problems surface.

``BatchMetricsListener`` captures Spark's own ``StreamingQueryProgress``
stream (driver-side, one small dict per batch — zero cost on the data
path) into a bounded in-memory log with a tabular ``summary()``. On a
real deployment the same hook forwards to a metrics sink; the bounded
deque keeps a long-lived driver from accumulating unbounded history.
"""

from __future__ import annotations

import threading
from collections import deque

from pyspark.sql.streaming import StreamingQueryListener


class BatchMetricsListener(StreamingQueryListener):
    """Collects per-batch progress rows for every query on the session.

    Keeps at most ``max_batches`` recent entries (FIFO). Thread-safe:
    Spark delivers events on its listener-bus thread.
    """

    def __init__(self, max_batches: int = 1000):
        self._lock = threading.Lock()
        self._rows: deque[dict] = deque(maxlen=max_batches)

    # -- listener callbacks (Spark contract) ---------------------------
    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        state_rows = sum(s.numRowsTotal for s in p.stateOperators)
        with self._lock:
            self._rows.append(
                {
                    "query_id": str(p.id),
                    "batch_id": p.batchId,
                    "input_rows": p.numInputRows,
                    "rows_per_sec": p.processedRowsPerSecond,
                    "batch_ms": p.batchDuration,
                    "state_rows": state_rows,
                }
            )

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass

    # -- accessors ------------------------------------------------------
    def batches(self, query_id: str | None = None) -> list[dict]:
        with self._lock:
            rows = list(self._rows)
        if query_id is not None:
            rows = [r for r in rows if r["query_id"] == query_id]
        return rows

    def rows_total(self, query_id: str | None = None) -> int:
        return sum(r["input_rows"] for r in self.batches(query_id))

    def summary(self, query_id: str | None = None) -> dict:
        rows = self.batches(query_id)
        if not rows:
            return {"batches": 0, "input_rows": 0}
        return {
            "batches": len(rows),
            "input_rows": sum(r["input_rows"] for r in rows),
            "max_state_rows": max(r["state_rows"] for r in rows),
            "mean_batch_ms": sum(r["batch_ms"] for r in rows) / len(rows),
        }


def attach_metrics(spark, max_batches: int = 1000) -> BatchMetricsListener:
    """Attach a fresh metrics listener to the session and return it.
    Detach with ``spark.streams.removeListener(listener)``."""
    listener = BatchMetricsListener(max_batches)
    spark.streams.addListener(listener)
    return listener
