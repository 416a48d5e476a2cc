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


def two_proportion_ztest(
    df: DataFrame,
    treatment_col: str | Column,
    converted_col: str | Column,
    round_dp: int = 6,
) -> DataFrame:
    """Pooled two-proportion z-test over per-unit assignment rows —
    the readout of every clickstream A/B experiment (capability
    extension per SURVEY.md §2.11: the reference charts per-page
    counts but has no experimentation surface at all).

    Input grain is one row per UNIT (user) with a boolean
    ``treatment_col`` (variant) and boolean ``converted_col``;
    deduplicating events to units is the caller's job (an exposure
    double-counted across events would shrink the variance estimate
    and manufacture significance).  Everything reduces to FOUR exact
    integer counts in one map-side-combinable aggregate — the
    ``group_ols`` cost model: one reduction, no shuffle of unit rows
    beyond the partial-agg combine, driver receives one row.

        z = (pt - pc) / sqrt(pp*(1-pp) * (1/nt + 1/nc)),
        pp = (xt + xc) / (nt + nc)   (pooled rate)

    plus per-arm Wilson 95% intervals (z* = 1.96 literal):

        (p + z*^2/2n +- z* * sqrt(p*(1-p)/n + z*^2/(4n^2))) / (1 + z*^2/n)

    Cross-engine exactness: counts are exact longs; every derived
    expression is stated with the identical operation tree in the
    DuckDB oracle (double casts on the literals there — the EWMA
    discipline); sqrt is IEEE-correctly-rounded on both engines; one
    dround per output.  NULL discipline: a NULL treatment flag drops
    the unit (it was never assigned); a NULL converted flag counts as
    not-converted.  Degenerate inputs (an empty arm, or a pooled rate
    of exactly 0 or 1) return NULL z — not 0.0, which would read as
    "measured, no effect"."""
    from ..functions import dround

    tc = F.col(treatment_col) if isinstance(treatment_col, str) else treatment_col
    cc = F.col(converted_col) if isinstance(converted_col, str) else converted_col
    conv = cc.isNotNull() & cc
    g = df.filter(tc.isNotNull()).agg(
        F.count(F.when(tc, F.lit(1))).alias("_nt"),
        F.count(F.when(~tc, F.lit(1))).alias("_nc"),
        F.count(F.when(tc & conv, F.lit(1))).alias("_xt"),
        F.count(F.when(~tc & conv, F.lit(1))).alias("_xc"),
    )
    nt = F.col("_nt").cast("double")
    nc = F.col("_nc").cast("double")
    xt = F.col("_xt").cast("double")
    xc = F.col("_xc").cast("double")
    pt = xt / nt
    pc = xc / nc
    pp = (xt + xc) / (nt + nc)
    se = F.sqrt(pp * (F.lit(1.0) - pp) * (F.lit(1.0) / nt + F.lit(1.0) / nc))
    z = F.when(
        (F.col("_nt") > 0) & (F.col("_nc") > 0) & (pp > F.lit(0.0)) & (pp < F.lit(1.0)),
        (pt - pc) / se,
    )
    zs = 1.96
    zs2 = zs * zs

    def _wilson(p: Column, n: Column, sign: float) -> Column:
        centre = p + F.lit(zs2) / (F.lit(2.0) * n)
        margin = F.lit(zs) * F.sqrt(
            p * (F.lit(1.0) - p) / n + F.lit(zs2) / (F.lit(4.0) * n * n)
        )
        return (centre + F.lit(sign) * margin) / (F.lit(1.0) + F.lit(zs2) / n)

    def _arm(p: Column, n: Column, ok: Column, name: str) -> "list[Column]":
        return [
            dround(F.when(ok, p), round_dp).alias(f"rate_{name}"),
            dround(F.when(ok, _wilson(p, n, -1.0)), round_dp).alias(f"wilson_lo_{name}"),
            dround(F.when(ok, _wilson(p, n, 1.0)), round_dp).alias(f"wilson_hi_{name}"),
        ]

    return g.select(
        F.col("_nt").alias("n_treatment"),
        F.col("_nc").alias("n_control"),
        F.col("_xt").alias("conv_treatment"),
        F.col("_xc").alias("conv_control"),
        *_arm(pt, nt, F.col("_nt") > 0, "treatment"),
        *_arm(pc, nc, F.col("_nc") > 0, "control"),
        dround(
            F.when((F.col("_nt") > 0) & (F.col("_nc") > 0), pt - pc), round_dp
        ).alias("abs_lift"),
        dround(z, round_dp).alias("z_stat"),
        F.when(z.isNotNull(), F.abs(z) > F.lit(zs)).alias("significant_95"),
    )
