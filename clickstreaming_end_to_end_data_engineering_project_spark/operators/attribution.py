"""Marketing/journey attribution: credit each conversion event to the
touch that earned it.  Last-touch (the default every analytics stack
ships first) = the most recent qualifying touch by the same entity
strictly before the conversion, within a lookback horizon.  No
reference-repo counterpart (the reference stops at raw journey
transitions); the published shape is the standard SQL
last-non-null-value window.

Scale shape: ONE window partitioned by the entity over the merged
touch+conversion stream (no self-join of conversions against touches,
which is the naive O(conversions × touches-per-user) plan) — the
ordered per-user pass a 1000-executor cluster parallelizes by user
hash.  The lookback check is a plain column comparison after the
window, so late filtering never re-sorts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def last_touch_attribution(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    touch_filter: Column,
    touch_col: str,
    conversion_filter: Column,
    lookback: "str | None" = None,
    tiebreak_cols: "list[str] | None" = None,
) -> DataFrame:
    """Annotate every conversion row with its attributed touch.

    - ``touch_filter`` marks touch rows, ``touch_col`` is the value
      credited (page, campaign, referrer, ...);
    - ``conversion_filter`` marks conversion rows;
    - a row can be both (self-touching conversions attribute to the
      PREVIOUS touch: the window ends 1 row before the current);
    - ``lookback`` (optional) is an interval literal ("30 minutes",
      "7 days"): a touch older than conversion_ts − lookback earns no
      credit and the attribution becomes NULL (the honest
      "unattributed" bucket — dropping the rows would silently
      under-count conversions);
    - ``tiebreak_cols`` orders same-instant rows deterministically
      (the repo's event_id convention).

    Output: the conversion rows with (attributed_<touch_col>,
    attributed_ts) appended.  Strictly-before semantics: a touch at
    exactly the conversion's (ts, tiebreak) does not win the instant —
    rows are ordered (ts, tiebreaks) and the frame is
    UNBOUNDED PRECEDING .. 1 PRECEDING, so simultaneous rows resolve
    by the tiebreak order, pinned in tests."""
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = (
        Window.partitionBy(entity_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_struct = F.when(
        touch_filter,
        F.struct(F.col(ts_col).alias("ts"), F.col(touch_col).alias("touch")),
    )
    annotated = events.withColumn(
        "_last_touch", F.last(touch_struct, ignorenulls=True).over(w)
    )
    in_window = (
        F.col("_last_touch.ts")
        >= F.col(ts_col) - F.expr(f"INTERVAL {lookback}")
        if lookback is not None
        else F.lit(True)
    )
    return (
        annotated.filter(conversion_filter)
        .select(
            "*",
            F.when(in_window, F.col("_last_touch.touch")).alias(
                f"attributed_{touch_col}"
            ),
            F.when(in_window, F.col("_last_touch.ts")).alias("attributed_ts"),
        )
        .drop("_last_touch")
    )
