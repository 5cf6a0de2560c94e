"""Streaming observability: per-micro-batch engine telemetry, queryable.

The reference's consumer loop logs a count per poll and nothing else
(`src/data_processing/kafka_stream.py:330-352` prints processed-row
totals); a production Structured Streaming fleet monitors the ENGINE's
per-batch telemetry instead — input rows, processing rate, trigger
duration, state-store size, watermark position, late-drop counts — which
Spark already publishes for every micro-batch through
``StreamingQueryListener``. This module turns that event stream into a
table: attach one :class:`ProgressRecorder` to the session and every
query's batches land as rows you can join, window, and alert on with the
same engine that runs the pipelines (the dashboards-over-telemetry half
of the observability family, beside the data-side profile/anomaly/silence
queries in ``plans/analytics.py``).

Design constraints, honored deliberately:

- the listener callback runs on the engine's event-bus thread: it must
  never run Spark actions or block (the same class of hazard as the
  foreachBatch re-entrancy deadlock this repo already guards against) —
  events are parsed from the progress JSON and buffered in memory under
  a lock, nothing else;
- materialization is the CALLER's action (:meth:`metrics_df`), after a
  drain or on a schedule — never inside the callback;
- one recorder observes EVERY query on the session (the listener is
  session-scoped), so a fleet needs exactly one attach; filter on
  ``query_name`` downstream.

At scale the buffer is bounded by batches observed, not data size — one
row per (query, micro-batch); a long-lived monitor should
:meth:`drain_rows` into its metrics table periodically, which also
truncates the buffer. A recorder nobody drains must still degrade
gracefully: pass ``max_rows`` to cap the buffer with drop-oldest
eviction (``dropped_rows`` counts what was lost), so a forgotten
listener on a long-lived session plateaus instead of leaking.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.listener import StreamingQueryListener

#: schema of the recorded metrics table.
METRICS_DDL = (
    "query_name string, query_id string, batch_id long, batch_ts string, "
    "input_rows long, rows_per_sec double, batch_ms long, "
    "state_rows long, state_updated long, late_dropped long, "
    "watermark string"
)


class ProgressRecorder(StreamingQueryListener):
    """Buffer every micro-batch's progress event as one metrics row.

    ``max_rows`` (optional) bounds the buffer: once full, the OLDEST rows
    are evicted and ``dropped_rows`` counts them — recent telemetry is
    what alerting reads, and a neglected recorder must plateau rather
    than grow one row per micro-batch forever. ``None`` keeps the
    unbounded behavior for drain-disciplined callers.
    """

    def __init__(self, max_rows: int | None = None) -> None:
        if max_rows is not None and max_rows < 1:
            raise ValueError(f"max_rows must be >= 1, got {max_rows}")
        self._lock = threading.Lock()
        self._rows: list[tuple] = []
        self._max_rows = max_rows
        self.dropped_rows = 0  # oldest rows evicted past max_rows

    # -- engine callbacks (event-bus thread: parse, buffer, return) ------

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        state = p.get("stateOperators") or []
        total_state = sum(s.get("numRowsTotal", 0) for s in state)
        updated = sum(s.get("numRowsUpdated", 0) for s in state)
        dropped = sum(s.get("numRowsDroppedByWatermark", 0) for s in state)
        row = (
            p.get("name"),
            p.get("id"),
            p.get("batchId"),
            p.get("timestamp"),
            p.get("numInputRows", 0),
            float(p.get("processedRowsPerSecond", 0.0)),
            int((p.get("durationMs") or {}).get("triggerExecution", 0)),
            total_state,
            updated,
            dropped,
            (p.get("eventTime") or {}).get("watermark"),
        )
        with self._lock:
            self._rows.append(row)
            if self._max_rows is not None and len(self._rows) > self._max_rows:
                excess = len(self._rows) - self._max_rows
                del self._rows[:excess]
                self.dropped_rows += excess

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- caller-side surface (any thread; runs Spark work) ---------------

    def rows(self) -> list[tuple]:
        """Snapshot of the buffered metrics rows (oldest first)."""
        with self._lock:
            return list(self._rows)

    def drain_rows(self) -> list[tuple]:
        """Return AND clear the buffer — the periodic-flush primitive."""
        with self._lock:
            out, self._rows = self._rows, []
        return out

    def metrics_df(self, spark: SparkSession) -> DataFrame:
        """The buffered telemetry as a DataFrame (non-destructive)."""
        return spark.createDataFrame(self.rows(), METRICS_DDL)


def attach(spark: SparkSession, max_rows: int | None = None) -> ProgressRecorder:
    """Register a fresh recorder on the session's listener bus."""
    rec = ProgressRecorder(max_rows=max_rows)
    spark.streams.addListener(rec)
    return rec


def detach(spark: SparkSession, rec: ProgressRecorder) -> None:
    """Remove the recorder; buffered rows stay readable."""
    spark.streams.removeListener(rec)
