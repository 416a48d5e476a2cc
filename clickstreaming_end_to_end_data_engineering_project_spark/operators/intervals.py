"""Interval algebra: merge overlapping/touching intervals per key
(gaps-and-islands) and measure the merged coverage — the warehouse
verbs behind "active periods", "machine uptime", "supplier shipping
windows", "union of validity ranges".  No reference-repo counterpart
(the reference has no interval logic at all); the shape is the classic
SQL islands pattern (running max of interval ends, new island when the
next start clears it), stated identically by the DuckDB oracles.

Scale shape: two windows partitioned by the key (a running max and a
running island-id sum) and one groupBy — parallelism is
key-cardinality-wide, no global sort, no self-join; per-key interval
lists never materialize anywhere (contrast the naive
overlap-self-join, which is quadratic per key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge each key's intervals into maximal disjoint islands:
    intervals that OVERLAP OR TOUCH (next start ≤ running max end —
    inclusive bounds, so [1,5] and [5,9] merge, [1,5] and [6,9] do
    not) collapse into one row.  Output: (key, island_start,
    island_end, n_intervals) — one row per island, n_intervals the
    number of source rows merged into it.

    Rows with a NULL start or end carry no interval and are dropped
    (SQL comparison semantics would otherwise poison the running
    max).  Inverted rows (end < start) raise at the first action —
    they are always a data bug, and silently "merging" them would
    hide it.  Works for any orderable type (dates, timestamps,
    numbers); the islands pattern is type-agnostic."""
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = Window.partitionBy(key_col).orderBy(start_col, end_col)
    # the inverted-row guard lives INSIDE the end column (a detached
    # guard column would be pruned unevaluated by the optimizer)
    guarded_end = F.when(
        F.col(end_col) < F.col(start_col),
        F.raise_error(
            F.concat(
                F.lit("merge_intervals: inverted interval (end < start) for key="),
                F.col(key_col).cast("string"),
            )
        ).cast(df.schema[end_col].dataType),
    ).otherwise(F.col(end_col))
    clean = df.filter(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    ).select(key_col, start_col, guarded_end.alias(end_col))
    # two steps (windows can't nest): the running-max comparison flags
    # island starts, then a cumulative sum numbers the islands — same
    # partition/order, so Catalyst evaluates both in one Window node
    flagged = clean.withColumn(
        "_new",
        # the first row per key has a NULL running max: coalesce it
        # to "new island"
        F.coalesce(
            F.col(start_col) > F.max(end_col).over(w_prev), F.lit(True)
        ).cast("long"),
    )
    islands = flagged.withColumn("_island", F.sum("_new").over(w_run)).drop("_new")
    return islands.groupBy(key_col, "_island").agg(
        F.min(start_col).alias("island_start"),
        F.max(end_col).alias("island_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    ).drop("_island")


def interval_coverage(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    length: "Column | None" = None,
) -> DataFrame:
    """Per-key coverage of the merged islands: (key, n_islands,
    covered) where ``covered`` sums ``length`` over the islands —
    default ``island_end - island_start`` (numeric intervals); pass
    e.g. ``F.datediff("island_end", "island_start") + 1`` for
    inclusive date ranges or a unix-微-difference for timestamps.  The
    double-counting the raw per-row sum would commit on overlapping
    intervals is exactly what merging removes."""
    merged = merge_intervals(df, key_col, start_col, end_col)
    if length is None:
        length = F.col("island_end") - F.col("island_start")
    return merged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(length).alias("covered"),
    )
