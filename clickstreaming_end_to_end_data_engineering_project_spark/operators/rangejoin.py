"""Binned interval-point range join — the range-join optimization
Spark has no native physical strategy for.

A point-in-interval join written directly (``p.ts >= i.start AND
p.ts < i.end``) has no equi-key, so Catalyst can only pick
BroadcastNestedLoopJoin (fine for a tiny interval side) or a
cartesian product — O(P·I) comparisons that melt down the moment both
sides are large.  The standard fix (used by Databricks' range-join
hint and every interval-join implementation in Flink) is binning:

- every point lands in exactly ONE fixed-width time bin;
- every interval is exploded to the (few) bins it overlaps;
- the join becomes an EQUI-join on the bin id + a residual
  range predicate.

Cost drops to O(P + I·k + matches), where k = avg interval width /
bin width — a shuffle-hash/sort-merge join on a proper key that AQE
can plan like any other.  Each (point, interval) pair can meet in at
most one bin (the point's), so the output needs NO dedup — the
rewrite is semantics-neutral by construction, which is what lets the
DuckDB oracle state the plain BETWEEN join.

Skew: a bin's population is bounded by bin_seconds worth of points,
so the knob that controls join fan-out also bounds the hottest key;
pick bin_seconds ≈ the typical interval length (k ≈ 1–2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 300,
    how: str = "inner",
) -> DataFrame:
    """Join every point to every interval with
    ``start <= point_ts < end`` (half-open, the streaming-window
    convention) via bin equi-join + residual filter.

    Returns points ⋈ intervals with all columns from both sides
    (internal bin columns dropped).  ``how`` supports ``inner`` and
    ``left_semi`` (points that fall in ANY interval).
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"unsupported join type: {how}")
    pb = points.withColumn(
        "_pbin", F.floor(F.unix_timestamp(F.col(point_ts)) / F.lit(bin_seconds))
    )
    # Inverted intervals (end < start) can match nothing — the
    # residual is unsatisfiable — but sequence(lo, hi) with hi < lo
    # DESCENDS, so one wildly inverted row of bad data would explode
    # into |span|/bin_seconds candidate bins of pure waste (r13
    # self-review).  Dropping them first is semantics-neutral (the
    # oracle's BETWEEN also matches nothing) and bounds the explode.
    intervals = intervals.filter(F.col(end_col) >= F.col(start_col))
    # sequence() is inclusive on both ends; an interval ending exactly
    # on a bin boundary admits one extra candidate bin whose points the
    # residual predicate then rejects — cheap and correct.
    ib = intervals.withColumn(
        "_ibin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / F.lit(bin_seconds)),
                F.floor(F.unix_timestamp(F.col(end_col)) / F.lit(bin_seconds)),
            )
        ),
    )
    residual = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) < F.col(end_col)
    )
    if how == "left_semi":
        return pb.join(
            ib, (pb["_pbin"] == ib["_ibin"]) & residual, "left_semi"
        ).drop("_pbin")
    return (
        pb.join(ib, (pb["_pbin"] == ib["_ibin"]) & residual, "inner")
        .drop("_pbin")
        .drop("_ibin")
    )
