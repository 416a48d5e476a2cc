"""Streaming state-store inspection (Spark 4.x State Data Source).

The reference has no way to see inside a running pipeline's state —
its monitor class is dead code (stream_processor.py:463-490 attaches
via a nonexistent API).  Spark 4 exposes every streaming operator's
state store as a read-only batch data source; these helpers wrap it
for the two operational questions that matter on a big cluster:

1. *What state exists?*  (`read_state`, `state_metadata`) — debug a
   stuck watermark, audit open sessions/windows after an incident,
   validate a migration.
2. *Is state skewed?*  (`state_skew`) — state stores shard by the
   grouping key, so one hot key family lands on one partition; at
   100 TB that partition's store is the OOM/checkpoint-lag candidate.
   `state_skew` aggregates row counts per shard inside Spark (no
   driver materialization) and returns the shards sorted hottest
   first.

All reads are batch scans of checkpoint files — they never touch or
lock the live query's stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_state(
    spark: SparkSession,
    checkpoint: str,
    operator_id: int = 0,
    store_name: str | None = None,
    batch_id: int | None = None,
) -> DataFrame:
    """Key/value state rows of one operator's store at a checkpoint.

    ``batch_id`` defaults to the last committed micro-batch; pass an
    earlier id to time-travel (bounded by retained checkpoint
    versions)."""
    reader = spark.read.format("statestore").option("operatorId", operator_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    return reader.load(checkpoint)


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Operator/store inventory of a checkpoint: operator ids + names,
    store names, shard counts, min/max usable batch ids."""
    return spark.read.format("state-metadata").load(checkpoint)


def state_skew(
    spark: SparkSession, checkpoint: str, operator_id: int = 0, store_name: str | None = None
) -> DataFrame:
    """Rows per state shard, hottest first, with each shard's share of
    total state — the direct probe for grouping-key skew in stateful
    streaming.  EVERY shard appears, including empty ones (a fully
    skewed store is one hot shard among N-1 zeros; dropping the zeros
    would make it look like a healthy 1-partition query), so the
    result is exactly one row per shard of the writing query.
    Aggregation happens executor-side; only the single-row shard count
    from the metadata touches the driver."""
    all_meta = state_metadata(spark, checkpoint)
    meta = all_meta.filter(F.col("operatorId") == operator_id)
    if store_name is not None:
        meta = meta.filter(F.col("stateStoreName") == store_name)
    n_shards = meta.agg(F.max("numPartitions")).first()[0]
    if n_shards is None:
        available = [
            (r["operatorId"], r["operatorName"], r["stateStoreName"])
            for r in all_meta.select(
                "operatorId", "operatorName", "stateStoreName"
            ).collect()
        ]
        raise ValueError(
            f"no state store matches operator_id={operator_id} "
            f"store_name={store_name!r} in checkpoint {checkpoint!r}; "
            f"available (operatorId, operatorName, stateStoreName): {available}"
        )
    counts = (
        read_state(spark, checkpoint, operator_id, store_name)
        .groupBy(F.col("partition_id"))
        .agg(F.count(F.lit(1)).alias("state_rows"))
    )
    shards = spark.range(int(n_shards)).select(
        F.col("id").cast(dict(counts.dtypes)["partition_id"]).alias("partition_id")
    )
    full = shards.join(counts, "partition_id", "left").fillna(0, subset=["state_rows"])
    total = F.sum("state_rows").over(Window.partitionBy())
    return (
        # try_divide: a valid-but-EMPTY store (all state evicted) has
        # total=0; a raw bigint divide would raise DIVIDE_BY_ZERO under
        # Spark 4's default ANSI mode — shares are NULL for that case
        full.withColumn("share", F.try_divide(F.col("state_rows"), total).cast("double"))
        .orderBy(F.col("state_rows").desc(), F.col("partition_id"))
    )
