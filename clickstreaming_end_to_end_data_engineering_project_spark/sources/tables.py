"""Batch table loaders over the driver-provided parquet testdata.

Column pruning and predicate pushdown reach the parquet scan because
loaders return the raw ``spark.read.parquet`` DataFrame — no collects,
no caching, no schema merging.  At 100 TB the same call pattern works
against a partitioned table root; partition pruning is Catalyst's job.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import TABLE_NAMES
from ..session import ensure_session_defaults

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to TIMESTAMP (session tz; UTC
    here, so values are oracle-identical to DuckDB's tz-naive reads).
    No-op when nothing is NTZ.  Needed for DataFrames that were read
    with ``spark.sql.parquet.inferTimestampNTZ.enabled=true`` — e.g.
    handed in by an externally built session — because event-time ops
    (withWatermark, window) reject NTZ columns."""
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy parquet scan).

    ``ensure_session_defaults`` disables NTZ inference before the read,
    so the scan itself yields TIMESTAMP columns; ``normalize_ntz`` is
    belt-and-suspenders for any engine change that re-introduces NTZ
    (it is exercised directly in tests/test_sources.py on a
    deliberately inference-on read)."""
    ensure_session_defaults(spark)
    return normalize_ntz(spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works —
    the engine's raw-SQL read surface (reference: arbitrary SELECT via
    storage/postgres_connector.py:44-55)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
