"""2-D skyline (Pareto frontier): rows not strictly dominated when
MINIMIZING one column and MAXIMIZING another — "cheapest for its size"
shapes (Börzsönyi, Kossmann, Stocker, "The Skyline Operator", ICDE
2001).  No reference-repo counterpart; the grid-pruned distributed
layout follows the MapReduce skyline literature (Mullesgaard, Pedersen,
Lu, Zhou, EDBT 2014 — grid partitioning with cross-cell pruning).

Why not the naive shapes at 100 TB:
- the NOT EXISTS self-join (the oracle's form) is a quadratic theta
  join over the corpus;
- the classic single-sort sweep (sort by min_col, keep rows beating
  the running max of max_col) is exact but a running max over a GLOBAL
  order — one task owns the whole corpus in Spark's window model.

The grid route keeps every step bucket- or survivor-bounded:

1. bucket rows by a range grid on ``min_col`` (default: integer floor
   — the column's DOMAIN, not the corpus, bounds the bucket count);
2. per-bucket max of ``max_col`` (map-side-combined groupBy, output is
   bucket-count-sized) and a strict-prefix running max over the tiny
   bucket frame (single-partition window over ~10^2..10^3 rows —
   deliberate and bounded, same pattern as the days-sized cumsum in
   plans/extras.orders_in_flight_daily);
3. prune: a row in bucket b with ``max_col`` ≤ prefix_max(b) is
   PROVABLY dominated — any strictly-lower bucket's witness has
   strictly smaller min_col (floor monotonicity) and ≥ max_col.
   Survivors per bucket are only the rows beating every lower bucket;
4. exact residual test among survivors is SAME-BUCKET ONLY: a
   dominating row from a lower bucket would have pruned the victim in
   step 3 (its max_col would be ≤ that bucket's contribution to the
   prefix max), and a higher-bucket row has strictly larger min_col —
   so one equi-join on bucket with the strict-domination predicate as
   an anti-join condition finishes the skyline.  The per-bucket
   nested-loop is survivor²-bounded, not corpus²."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    bucket: Column | None = None,
) -> DataFrame:
    """Rows of ``df`` not strictly dominated: y dominates x iff
    y.min_col ≤ x.min_col, y.max_col ≥ x.max_col, and at least one is
    strict.  Ties (equal on both) are mutually non-dominating — all
    kept, matching the NOT EXISTS oracle form.  Pure comparisons, no
    arithmetic on the values — engine-exact for any ordered type.

    ``bucket`` overrides the pruning grid (any expression
    monotonically non-decreasing in ``min_col`` with the property
    bucket(y) < bucket(x) ⇒ y.min_col < x.min_col; the default
    ``floor(min_col)`` has it).  The grid only affects cost, never
    results.  NULLs in either column are excluded (domination is
    undefined on NULL; the oracle convention: WHERE both NOT NULL)."""
    b = (bucket if bucket is not None else F.floor(F.col(min_col))).cast("long")
    rows = df.filter(
        F.col(min_col).isNotNull() & F.col(max_col).isNotNull()
    ).withColumn("_b", b)
    bstats = rows.groupBy("_b").agg(F.max(max_col).alias("_bmax"))
    w = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    pre = bstats.select("_b", F.max("_bmax").over(w).alias("_pre"))
    survivors = (
        rows.join(F.broadcast(pre), "_b")
        .filter(F.col("_pre").isNull() | (F.col(max_col) > F.col("_pre")))
        .drop("_pre")
    )
    a = survivors.alias("a")
    other = survivors.select(
        "_b", F.col(min_col).alias("_omin"), F.col(max_col).alias("_omax")
    ).alias("o")
    dominated = (
        (F.col("_omin") <= F.col(f"a.{min_col}"))
        & (F.col("_omax") >= F.col(f"a.{max_col}"))
        & (
            (F.col("_omin") < F.col(f"a.{min_col}"))
            | (F.col("_omax") > F.col(f"a.{max_col}"))
        )
    )
    return a.join(other, (F.col("a._b") == F.col("o._b")) & dominated, "left_anti").drop(
        "_b"
    )
