"""Dashboard read layer.

The reference ships an EMPTY ``dashboard/app.py`` (0 bytes) whose
intended queries exist only in README.md:119-146: real-time metrics,
top pages, revenue over time, journey flows.  This module implements
that read surface over the engine's materialized sink outputs — the
parquet tables the pipelines write — as plain DataFrames (a Flask/
Plotly front end would render these; serving is out of engine scope).

Each reader takes the sink directory written by
``app.py --sink-dir`` / ``ParquetSink`` and returns the
README-promised analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read(spark: SparkSession, sink_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sink_dir}/{table}")


def top_pages(spark: SparkSession, sink_dir: str, k: int = 10) -> DataFrame:
    """README 'Page popularity': total views per page, top-k, over the
    page-dimensioned sink.  ParquetSink appends update-mode emissions,
    so take the latest (= max, counts only grow) emission per
    (window, page) before summing across windows."""
    pv = _read(spark, sink_dir, "page_views_by_page")
    latest = pv.groupBy("window_start", "page").agg(F.max("view_count").alias("view_count"))
    return (
        latest.groupBy("page")
        .agg(F.sum("view_count").alias("total_views"))
        .orderBy(F.col("total_views").desc(), F.col("page"))
        .limit(k)
    )


def busiest_windows(spark: SparkSession, sink_dir: str, k: int = 10) -> DataFrame:
    """Top-k minutes by view volume (the time-axis companion)."""
    pv = _read(spark, sink_dir, "page_views")
    latest = pv.groupBy("window_start").agg(F.max("view_count").alias("view_count"))
    return latest.orderBy(F.col("view_count").desc(), F.col("window_start")).limit(k)


def revenue_over_time(spark: SparkSession, sink_dir: str) -> DataFrame:
    """README 'Revenue tracking': hourly revenue series."""
    p = _read(spark, sink_dir, "purchases")
    return (
        p.groupBy("window_start")
        .agg(
            F.max("total_revenue").alias("total_revenue"),
            F.max("purchase_count").alias("purchase_count"),
        )
        .orderBy("window_start")
    )


def event_mix(spark: SparkSession, sink_dir: str) -> DataFrame:
    """README 'User activity': share of each event type."""
    es = _read(spark, sink_dir, "event_stats")
    latest = es.groupBy("window_start", "event_type").agg(F.max("visit_count").alias("visit_count"))
    totals = latest.groupBy("event_type").agg(F.sum("visit_count").alias("visits"))
    grand = totals.agg(F.sum("visits").alias("_g"))
    return totals.crossJoin(F.broadcast(grand)).select(
        "event_type", "visits", (F.col("visits") / F.col("_g")).alias("share")
    )
