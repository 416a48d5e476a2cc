"""Bronze→silver→gold batch ETL tests."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from clickstreaming_end_to_end_data_engineering_project_spark.etl import run_events_etl
from clickstreaming_end_to_end_data_engineering_project_spark.sources.tables import load


def test_etl_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "lake")
    res = run_events_etl(spark, sf_dir, out)
    n = load(spark, sf_dir, "events").count()
    assert res.bronze_rows == n
    assert res.silver_rows == n  # testdata has no invalid rows or dupes
    assert res.quarantined_rows == 0
    assert res.gold_user_rows == load(spark, sf_dir, "events").select("user_id").distinct().count()

    # gold daily stats agree with a direct aggregation of the source
    daily = spark.read.parquet(f"{out}/gold/daily_stats")
    direct = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("event_date"), "event_type")
        .agg(F.count(F.lit(1)).alias("event_cnt"))
    )
    got = {(r["event_date"], r["event_type"]): r["event_cnt"] for r in daily.collect()}
    exp = {(r["event_date"], r["event_type"]): r["event_cnt"] for r in direct.collect()}
    assert got == exp

    # date-partitioned layers prune on date predicates
    one_day = daily.filter(F.col("event_date") == "2024-01-05")
    buf = io.StringIO()
    with redirect_stdout(buf):
        one_day.explain("formatted")
    assert "PartitionFilters" in buf.getvalue()

    # idempotent: re-running produces identical layer contents
    res2 = run_events_etl(spark, sf_dir, out)
    assert res2 == res
