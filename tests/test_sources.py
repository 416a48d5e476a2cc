"""Loader dtype normalization — regression for the round-5 breakage.

The driver testdata stores tz-less parquet timestamps (``timestamp[us]``
with isAdjustedToUTC=false).  PySpark 4.x infers those as TIMESTAMP_NTZ
by default, which ``withWatermark``/event-time ops reject and which the
DuckDB oracle never sees.  ``load()`` must always hand back plain
TIMESTAMP (session tz = UTC) no matter how the session was built.
"""

from __future__ import annotations

import pytest

from clickstreaming_end_to_end_data_engineering_project_spark.schema import TABLE_NAMES
from clickstreaming_end_to_end_data_engineering_project_spark.sources.tables import load


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_load_never_yields_timestamp_ntz(spark, sf_dir, name):
    dtypes = dict(load(spark, sf_dir, name).dtypes)
    ntz = {c: t for c, t in dtypes.items() if "ntz" in t}
    assert not ntz, f"{name}: NTZ columns leaked through load(): {ntz}"


def test_events_ts_is_timestamp(spark, sf_dir):
    assert dict(load(spark, sf_dir, "events").dtypes)["ts"] == "timestamp"


def test_normalize_ntz_casts_inference_on_read(spark, sf_dir):
    """normalize_ntz must actually convert an NTZ column: read events
    with inference forced ON (bypassing load()'s conf reset), confirm
    the raw scan yields TIMESTAMP_NTZ on this testdata, then confirm
    the helper rewrites it to TIMESTAMP."""
    import os

    from clickstreaming_end_to_end_data_engineering_project_spark.sources.tables import (
        normalize_ntz,
    )

    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        assert dict(raw.dtypes)["ts"] == "timestamp_ntz", (
            "precondition: this testdata must infer NTZ when inference is on"
        )
        fixed = normalize_ntz(raw)
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    assert dict(fixed.dtypes)["ts"] == "timestamp"
    assert fixed.withWatermark("ts", "1 minute").count() > 0


def test_load_is_watermarkable(spark, sf_dir):
    """The exact op that crashed BENCH_r05: withWatermark on events.ts."""
    df = load(spark, sf_dir, "events").withWatermark("ts", "1 minute")
    assert df.count() > 0


def test_load_handles_nanos_layout(spark, tmp_path):
    """Rounds 1-4 testdata stored events.ts as TIMESTAMP(NANOS), which
    Spark's reader rejects outright; the loader's guarded fallback
    (nanosAsLong + µs truncation) must still produce a watermarkable
    TIMESTAMP column if that layout ever returns."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = dt.datetime(2024, 1, 1, 9, 0, 0)
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime([base, base + dt.timedelta(minutes=1), base + dt.timedelta(minutes=2)]),
            "user_id": [1, 1, 2],
        }
    )
    table = pa.Table.from_pandas(pdf, preserve_index=False).set_column(
        1, "ts", pa.Array.from_pandas(pdf["ts"]).cast(pa.timestamp("ns"))
    )
    sf_dir = str(tmp_path)
    pq.write_table(table, f"{sf_dir}/events.parquet", coerce_timestamps=None)

    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    try:
        df = load(spark, sf_dir, "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        rows = sorted(r["ts"] for r in df.collect())
        assert rows[0] == base and rows[-1] == base + dt.timedelta(minutes=2)
        assert df.withWatermark("ts", "1 minute").count() == 3
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
