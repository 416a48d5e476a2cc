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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_seconds: int = 86400,
    keys: "list[tuple[str, str]] | None" = None,
) -> DataFrame:
    """Interval × interval OVERLAP join (r17 verdict #5): all pairs
    with ``l_start <= r_end AND r_start <= l_end`` (CLOSED intervals —
    the ``merge_intervals`` inclusive convention, so two date ranges
    that share one calendar day DO overlap), via the same bin rewrite
    as ``interval_point_join`` — both sides explode to their candidate
    bins and the join becomes an equi-join on the bin id + keys + the
    residual range predicate.

    The subtlety point-in-interval doesn't have: an overlapping PAIR
    can meet in MANY shared bins (a point meets an interval only in the
    point's one bin), so the naive rewrite needs a ``distinct`` over
    the full output — an extra shuffle sized by the join result.  The
    canonical MEETING-BIN rule removes it: credit the pair only in
    ``max(bin(l_start), bin(r_start))``, the bin where the LATER-
    starting interval begins.  Exactly-once by construction: floor is
    monotone, so ``bin(max(s_l, s_r)) = max(bin(s_l), bin(s_r))``, and
    for a truly overlapping pair ``max(s_l, s_r) <= min(e_l, e_r)``
    places that bin inside BOTH intervals' bin ranges — each side is
    present there, and the equality pins the pair to that single bin.
    The rule is part of the JOIN CONDITION (not a post-filter), so
    non-meeting bin collisions die inside the join.

    ``keys`` (optional) adds equality pairs ``(left_col, right_col)``
    to the join — the per-entity interval join every real use has
    (per-supplier busy islands × that supplier's order spans); the key
    also splits hot bins, bounding skew.  ``bin_seconds`` trades
    explode fan-out (long intervals → many bins) against bin
    population; pick it near the typical interval length.

    Rows with a NULL start or end carry no interval and are dropped
    (the theta predicate can never match them — semantics-neutral).
    Inverted rows (end < start) raise, the ``merge_intervals``
    convention: under the CLOSED-interval theta predicate an inverted
    row is still satisfiable (``[5,3]`` vs ``[2,9]``: 5<=9 and 2<=3),
    so silently dropping OR keeping it would each pick a surprising
    semantics for what is always a data bug — failing loudly is the
    only honest option (and the descending ``sequence()`` explode
    would otherwise manufacture garbage candidate bins).

    Output: left ⋈ right with all columns from both sides (internal
    bin columns dropped); column names must not collide across sides
    (select/alias first).  Cost O((|L| + |R|)·k + matches) with
    k = avg interval width / bin width — no cartesian, no distinct."""
    sides = []
    for df, s_col, e_col, tag in (
        (left, left_start, left_end, "l"),
        (right, right_start, right_end, "r"),
    ):
        guarded_end = F.when(
            F.col(e_col) < F.col(s_col),
            F.raise_error(
                F.concat(
                    F.lit(
                        "interval_overlap_join: inverted interval "
                        "(end < start): start="
                    ),
                    F.col(s_col).cast("string"),
                    F.lit(" end="),
                    F.col(e_col).cast("string"),
                )
            ).cast(df.schema[e_col].dataType),
        ).otherwise(F.col(e_col))
        start_bin = F.floor(
            F.unix_timestamp(F.col(s_col).cast("timestamp")) / F.lit(bin_seconds)
        )
        binned = (
            df.filter(F.col(s_col).isNotNull() & F.col(e_col).isNotNull())
            .withColumn(f"_{tag}sb", start_bin)
            .withColumn(
                f"_{tag}bin",
                F.explode(
                    F.sequence(
                        F.col(f"_{tag}sb"),
                        F.floor(
                            F.unix_timestamp(guarded_end.cast("timestamp"))
                            / F.lit(bin_seconds)
                        ),
                    )
                ),
            )
        )
        sides.append(binned)
    lb, rb = sides
    cond = (
        (lb["_lbin"] == rb["_rbin"])
        & (lb["_lbin"] == F.greatest(lb["_lsb"], rb["_rsb"]))
        & (lb[left_start] <= rb[right_end])
        & (rb[right_start] <= lb[left_end])
    )
    for lcol, rcol in keys or []:
        cond = cond & (lb[lcol] == rb[rcol])
    return (
        lb.join(rb, cond, "inner")
        .drop("_lbin")
        .drop("_rbin")
        .drop("_lsb")
        .drop("_rsb")
    )
