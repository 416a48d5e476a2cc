"""Custom stateful streaming operators via applyInPandasWithState.

SURVEY.md §2.7 T6 maps the reference's broken sessionization to either
``session_window`` (pipelines.py) or a custom stateful operator when
gap logic alone isn't enough.  This module implements the custom
path: per-user running engagement state with inactivity timeout —
the shape of any "profile accumulating across events, emitted on
quiescence" operator (feature aggregation, abuse scoring, cart
abandonment).

State design for scale: state per key is O(1) (a handful of counters),
keyed by user — the state store shards by the groupBy key across
executors; timeouts are event-time based so watermark controls both
lateness and state eviction, exactly like the built-in operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

USER_PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_count", IntegerType()),
        StructField("purchase_count", IntegerType()),
        StructField("total_value", DoubleType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
        StructField("emit_reason", StringType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("event_count", IntegerType()),
        StructField("purchase_count", IntegerType()),
        StructField("total_value", DoubleType()),
        StructField("first_ts_us", LongType()),
        StructField("last_ts_us", LongType()),
    ]
)


def _ts_micros(ts: pd.Series) -> pd.Series:
    """Event timestamps as int64 µs epochs, whatever unit pandas
    delivers.  applyInPandasWithState hands datetime64[ns] today, but
    the Arrow path is allowed to hand datetime64[us] (and does under
    some transformWithStateInPandas configurations) — deriving the
    scale from the dtype instead of hardcoding ns→µs avoids a silent
    1000× timestamp/timer skew if the delivery unit ever changes."""
    if pd.api.types.is_datetime64_any_dtype(ts):
        return ts.dt.as_unit("us").astype("int64")
    return ts.astype("int64") // 1000  # raw ns epoch longs


def _accumulate(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Fold new events into per-user state; emit + clear on timeout."""
    (user_id,) = key
    if state.hasTimedOut:
        ec, pc, tv, first_us, last_us = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "event_count": [ec],
                "purchase_count": [pc],
                "total_value": [tv],
                "first_ts": [pd.Timestamp(first_us, unit="us")],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
                "emit_reason": ["timeout"],
            }
        )
        return

    ec, pc, tv, first_us, last_us = state.get if state.exists else (0, 0, 0.0, None, None)
    for pdf in pdfs:
        ts_us = _ts_micros(pdf["ts"])
        ec += len(pdf)
        pc += int((pdf["event_type"] == "purchase").sum())
        tv += float(pdf.loc[pdf["event_type"] == "purchase", "value"].sum())
        batch_min, batch_max = int(ts_us.min()), int(ts_us.max())
        first_us = batch_min if first_us is None else min(first_us, batch_min)
        last_us = batch_max if last_us is None else max(last_us, batch_max)
    state.update((ec, pc, tv, first_us, last_us))
    # inactivity timeout: 30 event-time minutes after the newest event
    state.setTimeoutTimestamp(last_us // 1000 + 30 * 60 * 1000)
    return
    yield  # pragma: no cover - generator form


def user_engagement_profiles(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming per-user engagement profile, emitted when the user
    goes quiet for 30 event-time minutes.  Input needs (user_id, ts,
    event_type, value)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _accumulate,
            outputStructType=USER_PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
