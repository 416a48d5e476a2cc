"""Streaming deduplication.

Batch dedup is ``dropDuplicates`` (exact) / MinHash-LSH (near) — see
dedup.py.  On unbounded streams exact dedup needs bounded state:
``dropDuplicatesWithinWatermark`` keeps each key only until the
watermark passes it, which is the correct primitive for
at-least-once sources (Kafka redeliveries land within the watermark).

Reference tie-in: the reference has no dedup at all, but its Kafka
source + foreachBatch sinks are at-least-once end to end, so replays
would double-count (stream_processor.py:299-428).  This operator is
the missing idempotency layer, applied before aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate ``keys`` arriving within the watermark horizon.
    State per key is evicted once event time moves past watermark —
    O(keys within horizon), not O(stream)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
