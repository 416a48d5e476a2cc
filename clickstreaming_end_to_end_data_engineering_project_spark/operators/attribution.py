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


def multi_touch_attribution(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    touch_filter: Column,
    touch_col: str,
    conversion_filter: Column,
    model: str = "linear",
    lookback: "str | None" = None,
    tiebreak_cols: "list[str] | None" = None,
    half_life_seconds: "float | None" = None,
    endpoint_weight: float = 0.4,
) -> DataFrame:
    """Fractional-credit attribution (r17 verdict #4): every qualifying
    touch before a conversion earns a SHARE of the credit, completing
    the family ``last_touch_attribution`` opened.  One output row per
    (conversion, in-lookback touch): the conversion's columns plus
    (attributed_<touch_col>, attributed_ts, touch_pos (1-based in
    (ts, tiebreak) order), n_touches, weight); conversions with NO
    in-lookback touch emit one row with NULL touch columns, n_touches
    0 and weight 1.0 — the honest unattributed bucket, so
    Σ weight == 1 per conversion always and credit totals reconcile
    with revenue totals.

    Models (``weight`` as a deterministic double both engines state
    identically — the oracle-exactness contract):
    - ``linear``: 1.0 / n;
    - ``position`` (U-shaped): 1.0 when n == 1; 0.5 each when n == 2;
      else ``endpoint_weight`` for the first and last touch and
      ``(1.0 - 2.0·endpoint_weight) / (n - 2)`` for each middle —
      note the middle share is stated as that EXPRESSION, not a
      pre-computed literal (1.0 − 2·0.4 is 0.19999999999999996 in
      IEEE doubles; both engines must compute it the same way);
    - ``time_decay``: w ∝ 0.5^(Δseconds / half_life_seconds),
      normalized over the conversion's touch set.  The normalizing
      sum runs over the touch ARRAY in (ts, tiebreak) order — a
      deterministic float reduction THIS engine pins in tests, but
      ``pow`` is not correctly-rounded across libms, so time-decay
      is not oracle-hashable; gate queries use position/linear.

    Same touch/conversion/strictly-before/lookback semantics as
    ``last_touch_attribution`` (the window frame ends 1 row before the
    conversion; a touch at exactly ``conv_ts − lookback`` qualifies).

    Scale shape: ONE window per entity over the merged stream
    collecting prior TOUCH structs (``collect_list`` skips the
    non-touch rows' NULL structs), then a per-conversion array filter
    + posexplode — no conversions × touches self-join, and the output
    explode is exactly output-sized.  The per-entity touch array is
    the one growth point: bounded by ``lookback`` whenever the caller
    prunes the input to the analysis horizon (the streaming sink keeps
    only in-lookback touches, so its seeds are bounded by
    construction); without a lookback, prune upstream."""
    if model not in ("linear", "position", "time_decay"):
        raise ValueError(f"multi_touch_attribution: unknown model {model!r}")
    if model == "time_decay" and half_life_seconds is None:
        raise ValueError(
            "multi_touch_attribution: time_decay needs half_life_seconds"
        )
    if not 0.0 < float(endpoint_weight) <= 0.5:
        raise ValueError(
            "multi_touch_attribution: endpoint_weight must be in (0, 0.5] — "
            "the two endpoints cannot carry more than the whole credit"
        )
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
    conv = events.withColumn(
        "_touches", F.collect_list(touch_struct).over(w)
    ).filter(conversion_filter)
    if lookback is not None:
        horizon = F.col(ts_col) - F.expr(f"INTERVAL {lookback}")
        conv = conv.withColumn(
            "_touches", F.filter("_touches", lambda t: t["ts"] >= horizon)
        )
    conv = conv.withColumn("n_touches", F.size("_touches"))
    if model == "time_decay":
        hl = F.lit(float(half_life_seconds))
        decay = lambda t: F.pow(  # noqa: E731
            F.lit(0.5),
            (F.unix_micros(F.col(ts_col)) - F.unix_micros(t["ts"]))
            / F.lit(1e6)
            / hl,
        )
        conv = conv.withColumn(
            "_denom",
            F.aggregate(
                F.transform("_touches", decay), F.lit(0.0), lambda a, x: a + x
            ),
        )
    exploded = conv.select(
        "*", F.posexplode_outer("_touches").alias("_pos0", "_t")
    ).drop("_touches")
    n = F.col("n_touches")
    pos = (F.col("_pos0") + 1).cast("int")
    if model == "linear":
        weight = F.when(n == 0, F.lit(1.0)).otherwise(F.lit(1.0) / n)
    elif model == "position":
        ew = F.lit(float(endpoint_weight))
        weight = (
            F.when(n == 0, F.lit(1.0))
            .when(n == 1, F.lit(1.0))
            .when(n == 2, F.lit(0.5))
            .when((pos == 1) | (pos == n), ew)
            .otherwise((F.lit(1.0) - F.lit(2.0) * ew) / (n - 2))
        )
    else:  # time_decay
        weight = F.when(n == 0, F.lit(1.0)).otherwise(
            F.pow(
                F.lit(0.5),
                (F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("_t.ts")))
                / F.lit(1e6)
                / F.lit(float(half_life_seconds)),
            )
            / F.col("_denom")
        )
    out = exploded.select(
        "*",
        F.col("_t.touch").alias(f"attributed_{touch_col}"),
        F.col("_t.ts").alias("attributed_ts"),
        F.when(F.col("_pos0").isNotNull(), pos).alias("touch_pos"),
        weight.alias("weight"),
    ).drop("_pos0", "_t")
    return out.drop("_denom") if model == "time_decay" else out
