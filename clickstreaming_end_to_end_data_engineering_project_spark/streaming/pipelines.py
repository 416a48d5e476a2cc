"""The four reference streaming pipelines, re-expressed as Structured
Streaming with watermark-evictable state and pluggable sinks.

Reference: spark_processor/stream_processor.py —
  page views   :129-173 (1-min tumbling, 1-min watermark)
  sessions     :175-206 (upgraded: unwindowed groupBy → session_window,
                         SURVEY.md §4 gap #1)
  purchases    :208-254 (1-h tumbling, 5-min watermark)
  device stats :256-296 (1-h tumbling × dimension, 5-min watermark)

Each pipeline is a pure DataFrame→DataFrame transform (testable on a
batch DF and runnable on a streaming DF — same Catalyst plan modulo
the incrementalization), plus a ``start_*`` wrapper that attaches the
sink/trigger/checkpoint.  The reference's config that was defined but
never applied (maxOffsetsPerTrigger, config.py:53) is applied here.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..schema import CLICKSTREAM_SCHEMA
from .sinks import Sink


def kafka_source_options(
    brokers: str,
    topic: str = "clickstream",
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 10000,
) -> dict[str, str]:
    """The exact option set read_kafka_stream applies — pure and
    unit-testable in the brokerless sandbox, so the one part of the
    Kafka path that CAN be verified here (the wiring, including the
    maxOffsetsPerTrigger the reference defined but never set —
    SURVEY §2.7 T16) is pinned by test even though .load() isn't."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def read_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str = "clickstream",
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 10000,
) -> DataFrame:
    """Kafka source → typed event DataFrame (reference
    stream_processor.py:108-127).  Applies maxOffsetsPerTrigger for
    real (the reference defined it but never set it — SURVEY §2.7 T16).
    Requires the spark-sql-kafka package on the classpath."""
    reader = spark.readStream.format("kafka").options(
        **kafka_source_options(brokers, topic, starting_offsets, max_offsets_per_trigger)
    )
    raw = reader.load()
    return parse_event_stream(raw)


def parse_event_stream(raw: DataFrame) -> DataFrame:
    """JSON value → declared schema → flattened columns (reference
    stream_processor.py:121-125: cast, from_json, data.* expand)."""
    return raw.select(
        F.col("key").cast("string").alias("kafka_key"),
        F.from_json(F.col("value").cast("string"), CLICKSTREAM_SCHEMA).alias("data"),
        F.col("timestamp").alias("kafka_timestamp"),
    ).select("kafka_key", "data.*", "kafka_timestamp")


def read_file_stream(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-source twin for tests/local runs: same downstream plan as
    Kafka, deterministic with trigger(availableNow=True)."""
    return spark.readStream.schema(schema).parquet(path)


# ---- pure transforms (batch/streaming agnostic) ---------------------------


def page_view_pipeline(events: DataFrame, watermark: str = "1 minute", by: str | None = None) -> DataFrame:
    """Views per (1-min tumbling window[, dimension]): ref :137-149.
    ``by`` adds the reference's page grouping when the source carries a
    page column (the Kafka wire format does; the testdata twin doesn't)."""
    keys = [F.window("ts", "1 minute").alias("w")] + ([F.col(by)] if by else [])
    out = [
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
    ] + ([F.col(by)] if by else []) + [F.col("view_count")]
    return (
        events.filter(F.col("event_type") == "view")
        .withWatermark("ts", watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("view_count"))
        .select(*out)
    )


def session_pipeline(events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Gap-based sessions (ref :175-206, upgraded to session_window so
    state is evicted by the watermark instead of growing forever)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("event_count"),
        )
        .select("user_id", "session_start", "session_end", "event_count")
    )


def purchase_pipeline(events: DataFrame, watermark: str = "5 minutes") -> DataFrame:
    """Hourly purchase stats (ref :208-254); approx distinct buyers as
    in the reference, suited to streaming partial aggregation."""
    return (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("purchase_count"),
            F.sum("value").alias("total_revenue"),
            F.approx_count_distinct("user_id").alias("unique_buyers"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "purchase_count",
            "total_revenue",
            "unique_buyers",
        )
    )


def event_stats_pipeline(events: DataFrame, watermark: str = "5 minutes") -> DataFrame:
    """Hourly per-dimension stats (device-stats analog, ref :256-296)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("visit_count"),
            F.approx_count_distinct("user_id").alias("unique_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "visit_count",
            "unique_users",
        )
    )


def device_stats_pipeline(events: DataFrame, watermark: str = "5 minutes") -> DataFrame:
    """Hourly device stats over the WIRE schema (reference
    stream_processor.py:256-282): groups the nested ``device`` struct's
    three dimensions — device.type × device.browser × device.os — per
    1-hour tumbling window, with approx-distinct users and sessions.

    Unlike the other pipelines (which run on the testdata ``events``
    schema, event-time column ``ts``), this one consumes the
    CLICKSTREAM_SCHEMA produced by ``parse_event_stream`` /
    ``synthetic_clickstream`` (event-time column ``timestamp``) — it is
    the one pipeline whose group key exercises DEVICE_SCHEMA
    (schema.py:22).  Nested-field group keys are plain Catalyst
    ``GetStructField`` projections, so the shuffle key is the flattened
    (window, type, browser, os) tuple — no struct comparison at
    exchange time, same partial-aggregation shape as any scalar key."""
    return (
        events.withWatermark("timestamp", watermark)
        .groupBy(
            F.window("timestamp", "1 hour").alias("w"),
            F.col("device.type").alias("device_type"),
            F.col("device.browser").alias("browser"),
            F.col("device.os").alias("operating_system"),
        )
        .agg(
            F.count(F.lit(1)).alias("visit_count"),
            F.approx_count_distinct("user_id").alias("unique_users"),
            F.approx_count_distinct("session_id").alias("unique_sessions"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "device_type",
            "browser",
            "operating_system",
            "visit_count",
            "unique_users",
            "unique_sessions",
        )
    )


# ---- lifecycle ------------------------------------------------------------


@dataclass
class ClickstreamPipelines:
    """Builds and manages the four queries (reference start_processing,
    stream_processor.py:511-535 — the effective second definition, plus
    the graceful shutdown of the shadowed first one, :492-509)."""

    spark: SparkSession
    checkpoint_root: str
    trigger: dict = field(default_factory=lambda: {"availableNow": True})
    queries: list[StreamingQuery] = field(default_factory=list)

    # session windows only support append on streams (emit on watermark
    # finalization); the windowed aggs run in update mode like the ref
    _PIPELINES = {
        "page_views": (page_view_pipeline, "update"),
        "page_views_by_page": (lambda ev: page_view_pipeline(ev, by="page"), "update"),
        "sessions": (session_pipeline, "append"),
        "purchases": (purchase_pipeline, "update"),
        "event_stats": (event_stats_pipeline, "update"),
        # wire-schema only (timestamp + device struct); opt in by
        # providing a "device_stats" sink when events carries them
        "device_stats": (device_stats_pipeline, "update"),
    }

    def start(self, events: DataFrame, sinks: dict[str, Sink]) -> list[StreamingQuery]:
        for name, (transform, output_mode) in self._PIPELINES.items():
            if name not in sinks:
                continue
            q = (
                transform(events)
                .writeStream.outputMode(output_mode)
                .foreachBatch(sinks[name])
                .option("checkpointLocation", f"{self.checkpoint_root}/{name}")
                .trigger(**self.trigger)
                .queryName(name)
                .start()
            )
            self.queries.append(q)
        return self.queries

    def await_all(self, timeout: int | None = None) -> None:
        for q in self.queries:
            q.awaitTermination(timeout)

    def stop_all(self) -> None:
        for q in self.queries:
            if q.isActive:
                q.stop()
