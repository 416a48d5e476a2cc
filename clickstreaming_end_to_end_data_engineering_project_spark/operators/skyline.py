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

from collections.abc import Sequence

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


def skyline_kd(
    df: DataFrame,
    criteria: Sequence[tuple[str, str]],
    buckets: Sequence[Column] | None = None,
) -> DataFrame:
    """k-dimensional skyline (r15 verdict directive #6): rows not
    strictly dominated under d ≥ 2 criteria, each ``(column, "min" |
    "max")`` — the real Pareto request (price × size × rating).  Same
    semantics as ``skyline_2d`` lifted to d dims: y dominates x iff y
    is better-or-equal on EVERY criterion and strictly better on at
    least one; full ties are mutually non-dominating (all kept); rows
    with a NULL in any criterion are excluded.  Pure comparisons on
    the stored values — engine-exact for any numeric type.

    Distributed layout (the d-dim generalization of the 2-D grid,
    after Mullesgaard, Pedersen, Lu, Zhou, EDBT 2014 — grid cells with
    cross-cell pruning; their bitstring is realized here as the
    non-empty-cell frame itself, broadcast into two cell-level joins):

    1. CELL each row: per-criterion integer bucket, oriented so that
       better = smaller bucket (``floor(col)`` for min criteria,
       ``-floor(col)`` for max — so cell arithmetic is uniform).  Any
       per-dim monotone bucketing is correct (the grid affects COST
       only, pinned by a grid-invariance test); the default bounds the
       cell count by the columns' DOMAINS, not the corpus.
    2. CELL-LEVEL PRUNE: a non-empty cell C strictly dominates cell X
       iff C_i + 1 ≤ X_i on EVERY dim — then every point of C beats
       every point of X strictly on every criterion, so X's rows are
       all dominated.  One broadcast theta join over the (small,
       distinct-cell-sized) cell frame drops such X outright.
    3. EXACT RESIDUAL among surviving cells only: rows of cell X can
       only be dominated by rows in cells C with C_i ≤ X_i on every
       dim — and comparing against SURVIVING cells suffices, because
       domination is transitive with strictness preserved (if the
       dominator's own cell was pruned, its dominator also dominates
       the victim and lives in a surviving cell... recursing to a
       minimal surviving dominator).  The (X, C) cell-pair frame is a
       broadcast theta join over surviving cells; rows attach to each
       side by EQUI joins on the cell tuple, so the final left-anti
       row test is a hash join with the domination predicate as its
       residual — never a corpus×corpus nested loop.

    Cost shape: cells² cell-pair work (cell frames are
    domain-bounded), candidate row-pairs bounded by survivors ×
    reachable-cells — the d-dim price of exactness; the 2-D
    special case keeps the tighter value-level prefix-max prune in
    ``skyline_2d``."""
    crits = list(criteria)
    if len(crits) < 2:
        raise ValueError("skyline_kd needs >= 2 criteria")
    for c, direction in crits:
        if direction not in ("min", "max"):
            raise ValueError(f"criterion {c!r}: direction must be min|max, got {direction!r}")
    if buckets is not None and len(buckets) != len(crits):
        raise ValueError("buckets must match criteria length")
    d = len(crits)
    cellcols = [f"_c{i}" for i in range(d)]
    notnull = F.lit(True)
    for c, _ in crits:
        notnull = notnull & F.col(c).isNotNull()
    rows = df.filter(notnull)
    for i, ((c, direction), cc) in enumerate(zip(crits, cellcols)):
        if buckets is not None:
            expr = buckets[i]
        elif direction == "min":
            expr = F.floor(F.col(c))
        else:
            expr = -F.floor(F.col(c))
        rows = rows.withColumn(cc, expr.cast("long"))
    # cells: a corpus-wide distinct consumed by BOTH sides of the
    # cell-prune anti-join — materialize the (cell-count-sized) frame
    # so the corpus pass runs once, not once per join alias (the
    # recorded triangle_stats 43-exchange lesson, SCALING.md)
    cells = rows.select(*cellcols).distinct().localCheckpoint(eager=True)
    dom_cells = cells.select(
        *[F.col(cc).alias(f"_d{i}") for i, cc in enumerate(cellcols)]
    )
    strictly_below = F.lit(True)
    for i, cc in enumerate(cellcols):
        strictly_below = strictly_below & (F.col(f"_d{i}") + 1 <= F.col(cc))
    # consumed three times (survivor semi-join + both cellpair sides);
    # cell-count-sized, so the checkpoint is always cheap
    surviving_cells = cells.join(
        F.broadcast(dom_cells), strictly_below, "left_anti"
    ).localCheckpoint(eager=True)
    # consumed twice (victim side a + dominator rows o) — persist so
    # the corpus scan + cell projection + semi-join run once
    survivors = rows.join(F.broadcast(surviving_cells), cellcols, "left_semi").persist()
    try:
        # (victim cell X, dominator cell C) pairs with C <= X on every dim
        below_eq = F.lit(True)
        for i, cc in enumerate(cellcols):
            below_eq = below_eq & (F.col(f"_d{i}") <= F.col(cc))
        cellpairs = surviving_cells.join(
            F.broadcast(surviving_cells.select(
                *[F.col(cc).alias(f"_d{i}") for i, cc in enumerate(cellcols)]
            )),
            below_eq,
        )
        # dominator rows, keyed by their own cell on the C side of the pair
        o_vals = [F.col(c).alias(f"_o{i}") for i, (c, _) in enumerate(crits)]
        o = survivors.select(
            *[F.col(cc).alias(f"_d{i}") for i, cc in enumerate(cellcols)], *o_vals
        )
        cand = cellpairs.join(o, [f"_d{i}" for i in range(d)]).select(
            *cellcols, *[f"_o{i}" for i in range(d)]
        )
        better_eq = F.lit(True)
        strictly = F.lit(False)
        for i, (c, direction) in enumerate(crits):
            ov, xv = F.col(f"_o{i}"), F.col(f"a.{c}")
            if direction == "min":
                better_eq = better_eq & (ov <= xv)
                strictly = strictly | (ov < xv)
            else:
                better_eq = better_eq & (ov >= xv)
                strictly = strictly | (ov > xv)
        a = survivors.alias("a")
        cell_eq = F.lit(True)
        for cc in cellcols:
            cell_eq = cell_eq & (F.col(f"a.{cc}") == F.col(f"o.{cc}"))
        out = a.join(
            cand.alias("o"), cell_eq & better_eq & strictly, "left_anti"
        )
        # eager: the result must outlive the unpersist below
        return out.drop(*cellcols).localCheckpoint(eager=True)
    finally:
        survivors.unpersist()
