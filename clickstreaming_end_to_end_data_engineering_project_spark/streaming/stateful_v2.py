"""Spark 4.x ``transformWithStateInPandas`` twin of the
applyInPandasWithState engagement-profile operator (stateful.py).

Same semantics — per-user O(1) profile state, emitted when the user is
quiet for 30 event-time minutes — re-expressed on the arbitrary-state
API Spark 4 ships for exactly this operator family: typed state
handles (ValueState/ListState/MapState), first-class event-time
timers, and state-schema evolution.  Keeping both twins documents the
migration path: the v1 operator keeps working, the v2 one is what a
new deployment should use.

Scale notes (same story as v1, with two upgrades):
- State is sharded by the groupBy key across executors; per-key state
  is one fixed-width row, so state size is O(active users).
- Timers are event-time: the watermark both bounds lateness and
  drives eviction, so quiet users leave the store deterministically.
- transformWithState requires the RocksDB state store provider
  (incremental checkpointing, changelog offload) — the provider you
  want at 100 TB anyway; ``rocksdb_session_conf`` below returns the
  confs a deployment sets.

Environment gate (same category as the Kafka source): executing a
transformWithState query needs the ``protobuf`` package (the Python
worker speaks the state-server protocol over protobuf messages), which
this sandbox does not ship.  Plan construction, schemas, and the
processor logic are real and unit-tested; the end-to-end leg is
skipped unless ``google.protobuf`` imports
(``tests/test_streaming.py::test_stateful_user_profiles_v2_*``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from .stateful import _STATE_SCHEMA, USER_PROFILE_SCHEMA, _ts_micros

INACTIVITY_MS = 30 * 60 * 1000

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def rocksdb_session_conf() -> dict[str, str]:
    """Session confs required by transformWithState (and recommended
    for any large-state deployment)."""
    return {"spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER}


class EngagementProfileProcessor(StatefulProcessor):
    """Fold events into per-user counters; emit + clear on an
    event-time inactivity timer."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._profile = handle.getValueState("profile", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        ec, pc, tv, first_us, last_us = (
            self._profile.get() if self._profile.exists() else (0, 0, 0.0, None, None)
        )
        for pdf in rows:
            ts_us = _ts_micros(pdf["ts"])  # unit derived from dtype
            ec += len(pdf)
            pc += int((pdf["event_type"] == "purchase").sum())
            tv += float(pdf.loc[pdf["event_type"] == "purchase", "value"].sum())
            batch_min, batch_max = int(ts_us.min()), int(ts_us.max())
            first_us = batch_min if first_us is None else min(first_us, batch_min)
            last_us = batch_max if last_us is None else max(last_us, batch_max)
        self._profile.update((ec, pc, tv, first_us, last_us))
        # one live timer per user: re-arm to newest-event + 30 min
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer(last_us // 1000 + INACTIVITY_MS)
        return iter(())

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ec, pc, tv, first_us, last_us = self._profile.get()
        self._profile.clear()
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

    def close(self) -> None:
        pass


def user_engagement_profiles_v2(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """transformWithStateInPandas engagement profiles — semantics
    identical to stateful.user_engagement_profiles (same output schema,
    same 30-minute event-time inactivity emission).  The session must
    run the RocksDB state store provider (``rocksdb_session_conf``)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            EngagementProfileProcessor(),
            outputStructType=USER_PROFILE_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
