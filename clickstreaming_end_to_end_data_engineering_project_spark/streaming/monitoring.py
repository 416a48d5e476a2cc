"""Streaming progress monitoring.

The reference defines a listener with onStarted/onProgress/onTerminated
(stream_processor.py:463-490) but attaches it via a nonexistent
``query.addListener`` (:467) — dead code.  This is the working
equivalent, attached through the real API
(``spark.streams.addListener``), recording the same metrics the
reference logs: rows/sec and trigger latency."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class ProgressRecord:
    query_name: str
    batch_id: int
    num_input_rows: int
    processed_rows_per_second: float
    duration_ms: int


class QueryMonitor(StreamingQueryListener):
    """Collects per-trigger progress for all queries on the session.
    Driver-side and O(triggers) memory — bound ``max_records`` in
    long-running deployments."""

    def __init__(self, max_records: int = 10000):
        self.max_records = max_records
        self.started: list[str] = []
        self.terminated: list[str] = []
        self.progress: list[ProgressRecord] = []

    def onQueryStarted(self, event) -> None:
        self.started.append(event.name or event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        if len(self.progress) < self.max_records:
            self.progress.append(
                ProgressRecord(
                    query_name=p.name or str(p.id),
                    batch_id=p.batchId,
                    num_input_rows=p.numInputRows,
                    processed_rows_per_second=p.processedRowsPerSecond or 0.0,
                    duration_ms=(p.durationMs or {}).get("triggerExecution", 0),
                )
            )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing dependent
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))


def attach_monitor(spark: SparkSession, max_records: int = 10000) -> QueryMonitor:
    mon = QueryMonitor(max_records)
    spark.streams.addListener(mon)
    return mon


def detach_monitor(spark: SparkSession, mon: QueryMonitor) -> None:
    spark.streams.removeListener(mon)
