"""Streaming joins.

Capability extension (SURVEY.md §2.3: the reference has NO joins; its
README's funnel/attribution analyses need them).  Two shapes:

- stream-static enrichment: the streaming side joins a broadcastable
  dimension — no state, every micro-batch hash-joins against the
  (possibly refreshed) static side.
- stream-stream interval join: purchases matched to the same user's
  views within a bounded event-time interval.  The time-bound + both
  watermarks make the join state finite (Spark buffers only rows
  inside the watermark×interval horizon) — this is the attribution
  join at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dimension(events: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static broadcast enrichment."""
    return events.join(F.broadcast(dim), key, "left")


def purchase_view_attribution(
    events: DataFrame,
    view_watermark: str = "10 minutes",
    purchase_watermark: str = "10 minutes",
    attribution_window: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: each purchase paired with the same
    user's views in the preceding ``attribution_window``.  State on
    both sides is bounded by watermark + interval."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_event_id"),
        )
        .withWatermark("view_ts", view_watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_event_id"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", purchase_watermark)
    )
    return purchases.join(
        views,
        F.expr(
            f"""
            p_user_id = v_user_id AND
            view_ts <= purchase_ts AND
            view_ts >= purchase_ts - INTERVAL {attribution_window}
            """
        ),
        "inner",
    ).select(
        "purchase_event_id",
        F.col("p_user_id").alias("user_id"),
        "purchase_ts",
        "purchase_value",
        "view_event_id",
        "view_ts",
    )
