"""Grouped least-squares trend fitting from exact sufficient
statistics — in-engine analytics without MLlib.

A per-group simple linear regression needs only five sufficient
statistics (n, Σx, Σy, Σxy, Σx²), all computable in ONE map-side-
combinable aggregate — the textbook closed form

    slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    intercept = (Σy − slope·Σx) / n

This shape matters at 100 TB: a trend fit per group is one shuffle on
the group key with partial aggregation, identical cost to any
groupBy().sum() — no per-group iteration, no collect, no UDF.

Cross-engine exactness: callers pass x as an INTEGER column and y as
a DECIMAL column, so all five sums are exact (decimal×int products
stay decimal; integer sums never round).  The five sums are cast to
double only at the end, and the slope/intercept expressions are
assembled with the identical operation tree the DuckDB oracle states
— two exact doubles divided once — so results match bit-for-bit
after the final ``dround``.  (The exact-sum-then-divide discipline of
``doc_length_quantiles``; overflow headroom: decimal sums carry 38
digits, and the double conversion is exact while |sum·10^scale| <
2^53 ≈ 9e15 — beyond that, widen to decimal division.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_ols(
    df: DataFrame,
    group_cols: list[str],
    x: str | Column,
    y_dec: str | Column,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group OLS fit of y on x.  Output: group cols + n_points,
    slope, intercept (both dround-ed to ``round_dp``).  Groups where
    x is constant (zero variance) return NULL slope/intercept rather
    than dividing by zero.

    NULL handling is SQL's regr_* discipline: a row where EITHER x or
    y is NULL is excluded from ALL five statistics — counting it in n
    while the sums skip it would silently skew every fit (r13
    self-review; plain F.count(lit(1)) had exactly that bug)."""
    from ..functions import dround

    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y_dec) if isinstance(y_dec, str) else y_dec
    ok = xc.isNotNull() & yc.isNotNull()
    stats = df.groupBy(*group_cols).agg(
        F.count(F.when(ok, F.lit(1))).alias("_n"),
        F.sum(F.when(ok, xc)).alias("_sx"),
        F.sum(F.when(ok, xc * xc)).alias("_sxx"),
        F.sum(F.when(ok, yc)).alias("_sy_dec"),
        F.sum(F.when(ok, xc * yc)).alias("_sxy_dec"),
    )
    n = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sxx = F.col("_sxx").cast("double")
    sy = F.col("_sy_dec").cast("double")
    sxy = F.col("_sxy_dec").cast("double")
    denom = n * sxx - sx * sx
    slope = F.when(denom != F.lit(0.0), (n * sxy - sx * sy) / denom)
    intercept = (sy - slope * sx) / n
    return stats.select(
        *group_cols,
        F.col("_n").alias("n_points"),
        dround(slope, round_dp).alias("slope"),
        dround(intercept, round_dp).alias("intercept"),
    )


def group_corr(
    df: DataFrame,
    group_cols: list[str],
    x: str | Column,
    y: str | Column,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group Pearson correlation of two INTEGER columns from six
    exact sufficient statistics in one map-side-combinable aggregate —
    same cost model as ``group_ols``.

    Cross-engine exactness: integer inputs make every sum exact; the
    denominator uses sqrt(), which (unlike log/pow) IEEE-754 requires
    to be CORRECTLY ROUNDED, so both engines compute the identical
    double; one final division + dround.  Groups with zero variance in
    either column return NULL.  NULL handling is ``group_ols``'s
    regr_* discipline: rows where either column is NULL are excluded
    from ALL six statistics."""
    from ..functions import dround

    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")
    ok = xc.isNotNull() & yc.isNotNull()
    stats = df.groupBy(*group_cols).agg(
        F.count(F.when(ok, F.lit(1))).alias("_n"),
        F.sum(F.when(ok, xc)).alias("_sx"),
        F.sum(F.when(ok, yc)).alias("_sy"),
        F.sum(F.when(ok, xc * xc)).alias("_sxx"),
        F.sum(F.when(ok, yc * yc)).alias("_syy"),
        F.sum(F.when(ok, xc * yc)).alias("_sxy"),
    )
    n = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    corr = F.when(
        (dx > F.lit(0.0)) & (dy > F.lit(0.0)),
        (n * sxy - sx * sy) / (F.sqrt(dx) * F.sqrt(dy)),
    )
    return stats.select(
        *group_cols,
        F.col("_n").alias("n_points"),
        dround(corr, round_dp).alias("corr"),
    )
