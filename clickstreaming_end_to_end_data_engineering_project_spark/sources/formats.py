"""Generic batch/stream source-format readers and writers.

The reference's only wire format is JSON-over-Kafka; a drop-in engine
needs the standard lake formats too.  Schema is always explicit
(schema inference is a full extra pass over 100 TB and makes types
drift between runs — the reference got this right with its declared
StructType, SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True, sep: str = ","
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_json_lines(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """NDJSON; malformed rows yield nulls (PERMISSIVE), matching the
    from_json behavior tested for the Kafka path."""
    return spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)


def stream_csv(spark: SparkSession, path: str, schema: StructType, header: bool = True) -> DataFrame:
    return spark.readStream.schema(schema).option("header", str(header).lower()).csv(path)


def stream_json_lines(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.readStream.schema(schema).json(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Date/key-partitioned layout — the scan-side partition-pruning
    contract (SCALING.md storage section)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def compact_parquet(spark: SparkSession, src: str, dst: str, target_files: int) -> None:
    """Small-file compaction: rewrite a directory into ``target_files``
    evenly-sized files.  The classic maintenance job for streaming
    sinks that emit a file per micro-batch — at 100 TB, scan cost is
    dominated by file-open overhead once files shrink below ~100 MB."""
    import os

    if os.path.abspath(src) == os.path.abspath(dst):
        # overwrite clears dst before the lazy read of src runs — an
        # in-place call would destroy the data mid-scan
        raise ValueError("compact_parquet: dst must differ from src (write-then-swap instead)")
    spark.read.parquet(src).repartition(target_files).write.mode("overwrite").parquet(dst)
