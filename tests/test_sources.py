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
