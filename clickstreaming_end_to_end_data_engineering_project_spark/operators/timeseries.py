"""Grid-regular time-series operators: resample-with-linear-
interpolation and Holt linear-trend smoothing.

Capability extension per SURVEY.md §2.11: the reference's dashboards
chart windowed counts straight off the stream (stream_processor.py's
tumbling aggregates) and simply show holes where a window had no
events.  A real analytics surface needs the two standard repairs —
fill the grid (resample + interpolate) and smooth/extrapolate the
trend (Holt's linear method, the level+trend upgrade of the EWMA the
r16 round added in plans/extras.daily_revenue_ewma).

Scale shape (100 TB discipline):

- ``resample_linear`` is one keyed aggregate (map-side combinable
  exact-decimal sums) + one per-key ``sequence()`` explode + one
  equi-join on (key, bucket) + two RUNNING-frame windows (ascending
  for the previous neighbour, descending for the next — see the
  shrinking-frame note at the window specs; Spark keeps them as two
  Window operators over one exchange, the second differing only by
  sort order).  The executed plan is 4 exchanges total (bucket agg,
  span agg, grid⋈obs join, window), ALL over bucket-grain data.
  Grid size is keys x buckets, independent of input row count:
  100 TB of raw events collapses to the bucket grain at the first
  aggregate and every later stage shuffles only the grid.  No UDF,
  no collect, no iteration.
- ``holt_smooth`` folds each key's (short, bucket-grain) series with
  ``F.aggregate`` — a JVM higher-order function over an array built
  by one keyed collect_list.  The fold is inherently sequential PER
  KEY (the recurrence is order-1 linear with time-varying input, so
  there is no map-side-combinable form — unlike group_ols's closed
  form); parallelism comes from the key dimension, which is exactly
  how a 1000-executor cluster wants a per-entity forecast to run.
  The array is bucket-grain (days/months), NOT event-grain: its
  length is bounded by the calendar, not the data.

Cross-engine exactness (the family discipline of
plans/extras._ewma_oracle): series values enter as exact decimal sums
cast to double once; every smoothing coefficient is a Python float
literal stated identically in the DuckDB oracle (which must CAST its
literals to DOUBLE — DuckDB otherwise runs bare numeric literals in
exact DECIMAL arithmetic, measured a half-ulp off the IEEE chain);
interpolation and recurrence expressions are assembled with the
identical operation tree on both engines; one ``dround`` at the end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import dround


def resample_linear(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_dec: Column,
    step_seconds: int = 3600,
    round_dp: int = 6,
) -> DataFrame:
    """Per-key regular resampling with linear interpolation of missing
    buckets.

    ``value_dec`` must be an exact DECIMAL column expression (e.g.
    ``money("value")``); each observed bucket's value is the exact
    decimal mean cast to double (order-independent — the avg_money
    discipline).  The output grid runs from each key's first to last
    observed bucket at ``step_seconds`` spacing; buckets with no
    observation get the linear interpolation between the nearest
    observed neighbours:

        v = prev + (next - prev) * (t - t_prev) / (t_next - t_prev)

    with the ratio computed from epoch-second longs (exact in double
    far past any calendar range).  Leading/trailing edges cannot be
    missing by construction (the grid starts and ends ON observed
    buckets).  Output: key cols + ``bucket`` (timestamp), ``value``
    (dround-ed), ``is_observed`` flag.

    NULL discipline: rows where ``ts_col`` or the value expression is
    NULL are dropped up front — counting them in the bucket mean while
    the sum skipped them would skew every observed point (the
    group_ols r13 lesson).
    """
    step = int(step_seconds)
    vc = value_dec
    tsec = F.col(ts_col).cast("long")
    bucket_sec = (tsec - tsec % F.lit(step)).alias("_bsec")
    obs = (
        df.filter(F.col(ts_col).isNotNull() & vc.isNotNull())
        .select(*key_cols, bucket_sec, vc.alias("_v_dec"))
        .groupBy(*key_cols, "_bsec")
        .agg(
            (F.sum("_v_dec").cast("double") / F.count(F.lit(1))).alias("_v")
        )
    )
    spans = obs.groupBy(*key_cols).agg(
        F.min("_bsec").alias("_lo"), F.max("_bsec").alias("_hi")
    )
    grid = spans.select(
        *key_cols,
        F.explode(F.sequence("_lo", "_hi", F.lit(step))).alias("_bsec"),
    )
    g = grid.join(obs, [*key_cols, "_bsec"], "left")
    # both neighbour scans are RUNNING frames (unbounded-preceding →
    # current row), the shape Spark evaluates incrementally in O(rows)
    # per partition; the naive "next" spec — first_value over
    # (currentRow, unboundedFollowing) — is a SHRINKING frame that
    # Spark re-aggregates from scratch per row, O(rows²) per key
    # (measured 3.7 s vs 0.4 s on the 60k-row sf0.1 grid), so the
    # next-neighbour scan runs the same running frame over the
    # DESCENDING bucket order instead — one extra sort, linear work
    wprev = (
        Window.partitionBy(*key_cols)
        .orderBy("_bsec")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wnext = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_bsec").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ob = F.when(F.col("_v").isNotNull(), F.struct("_bsec", "_v"))
    prev = F.last(ob, ignorenulls=True).over(wprev)
    nxt = F.last(ob, ignorenulls=True).over(wnext)
    # the interpolation ratio: long-exact numerator/denominator, ONE
    # double division, then the affine combination — stated with the
    # identical tree in the oracle
    interp = prev["_v"] + (nxt["_v"] - prev["_v"]) * (
        (F.col("_bsec") - prev["_bsec"]).cast("double")
        / (nxt["_bsec"] - prev["_bsec"]).cast("double")
    )
    return g.select(
        *key_cols,
        F.col("_bsec").cast("timestamp").alias("bucket"),
        dround(
            F.when(F.col("_v").isNotNull(), F.col("_v")).otherwise(interp),
            round_dp,
        ).alias("value"),
        F.col("_v").isNotNull().alias("is_observed"),
    )


def holt_smooth(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    round_dp: int = 6,
    impl: str = "fold",
) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing per key.

    Input must already be at series grain: one row per (key, order)
    with a double ``value_col`` (produce it with an exact decimal sum
    — the caller owns that discipline).  Init convention, stated
    identically in every oracle: ``level_0 = y_0``, ``trend_0 = 0``;
    for t >= 1

        forecast_t = level_{t-1} + trend_{t-1}          (one-step-ahead)
        level_t    = a*y_t + (1-a)*(level_{t-1} + trend_{t-1})
        trend_t    = b*(level_t - level_{t-1}) + (1-b)*trend_{t-1}

    with ``a``/``1-a``/``b``/``1-b`` all Python-computed double
    literals (the EWMA-family coefficient discipline).  ``forecast``
    is NULL at t = 0 (nothing to forecast from).  Output: key cols +
    order col, ``y``, ``forecast``, ``level``, ``trend`` (the last
    three dround-ed) — the final row's (level, trend) is the model
    state a caller extrapolates from.

    Two implementations, pinned bit-equal in tests (IEEE doubles run
    the identical operation sequence either way):

    - ``impl="fold"`` (default): ONE ``F.aggregate`` per key over the
      sorted series array; the accumulator carries (level, trend,
      out-array) and appends one output struct per step.  Zero Python
      — the lambda compiles to Catalyst expressions evaluated
      JVM-side — but the array append copies the accumulator, O(n²)
      per key: measured 4.2 s for 25 keys × ~2,200 daily points.
      Right for monthly/weekly-grain series (n ≲ low hundreds).
    - ``impl="pandas"``: ``applyInPandas`` per key — a linear numpy
      loop over Arrow-batched doubles, the documented long-series
      path (the one place Python earns its batch-transfer cost:
      linear beats quadratic from a few hundred points up; same
      measurement drops to 0.6 s).  Requires a single-column
      ``order_col`` sort key, like the fold.
    """
    a = float(alpha)
    b = float(beta)
    if not (0.0 < a <= 1.0 and 0.0 <= b <= 1.0):
        raise ValueError("holt_smooth: need 0 < alpha <= 1 and 0 <= beta <= 1")
    if impl == "pandas":
        return _holt_pandas(df, key_cols, order_col, value_col, a, b, round_dp)
    if impl != "fold":
        raise ValueError("holt_smooth: impl must be 'fold' or 'pandas'")
    one_a = 1.0 - a
    one_b = 1.0 - b
    series = df.groupBy(*key_cols).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(value_col).alias("y")))
        ).alias("_s")
    )
    out_t = (
        "array<struct<o:" + df.schema[order_col].dataType.simpleString() + ","
        "y:double,forecast:double,level:double,trend:double>>"
    )
    init = F.struct(
        F.lit(None).cast("double").alias("l"),
        F.lit(None).cast("double").alias("t"),
        F.expr(f"CAST(array() AS {out_t})").alias("out"),
    )

    def _step(acc, x):
        first = acc["l"].isNull()
        fc = acc["l"] + acc["t"]
        lvl = F.when(first, x["y"]).otherwise(
            F.lit(a) * x["y"] + F.lit(one_a) * (acc["l"] + acc["t"])
        )
        trd = F.when(first, F.lit(0.0)).otherwise(
            F.lit(b) * (lvl - acc["l"]) + F.lit(one_b) * acc["t"]
        )
        row = F.struct(
            x["o"].alias("o"),
            x["y"].alias("y"),
            F.when(first, F.lit(None).cast("double")).otherwise(fc).alias("forecast"),
            lvl.alias("level"),
            trd.alias("trend"),
        )
        return F.struct(
            lvl.alias("l"),
            trd.alias("t"),
            F.concat(acc["out"], F.array(row)).alias("out"),
        )

    folded = series.select(
        *key_cols, F.aggregate("_s", init, _step)["out"].alias("_out")
    )
    e = folded.select(*key_cols, F.explode("_out").alias("_e"))
    return e.select(
        *key_cols,
        F.col("_e.o").alias(order_col),
        F.col("_e.y").alias("y"),
        dround(F.col("_e.forecast"), round_dp).alias("forecast"),
        dround(F.col("_e.level"), round_dp).alias("level"),
        dround(F.col("_e.trend"), round_dp).alias("trend"),
    )


def _holt_pandas(
    df: DataFrame,
    key_cols: "list[str]",
    order_col: str,
    value_col: str,
    a: float,
    b: float,
    round_dp: int,
) -> DataFrame:
    """Linear-time Holt fold via ``applyInPandas`` — see
    ``holt_smooth(impl="pandas")``.  The loop states the recurrence
    with the exact operation sequence of the JVM fold (and of the
    recursive-CTE oracle): Python floats ARE IEEE doubles and numpy
    scalars here are float64, so ``fold == pandas`` holds bit-for-bit
    (pinned in tests)."""
    import math

    import pandas as pd

    one_a, one_b = 1.0 - a, 1.0 - b
    scale = float(10**round_dp)

    out_schema = (
        ", ".join(
            f"{c} {df.schema[c].dataType.simpleString()}" for c in key_cols
        )
        + f", {order_col} {df.schema[order_col].dataType.simpleString()}"
        + ", y double, forecast double, level double, trend double"
    )

    def dr(x: "float | None") -> "float | None":
        if x is None:
            return None
        return math.floor(x * scale + 0.5) / scale

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order_col, kind="mergesort")
        ys = pdf[value_col].astype("float64").to_list()
        fc, lv, tr = [], [], []
        l = t = None
        for y in ys:
            if l is None:
                fc.append(None)
                l, t = y, 0.0
            else:
                fc.append(l + t)
                newl = a * y + one_a * (l + t)
                t = b * (newl - l) + one_b * t
                l = newl
            lv.append(l)
            tr.append(t)
        out = pdf[[*key_cols, order_col]].copy()
        out["y"] = ys
        out["forecast"] = pd.array([dr(x) for x in fc], dtype="float64")
        out["level"] = pd.array([dr(x) for x in lv], dtype="float64")
        out["trend"] = pd.array([dr(x) for x in tr], dtype="float64")
        return out

    return df.groupBy(*key_cols).applyInPandas(fold, schema=out_schema)
