"""Slowly-changing-dimension (SCD Type 2) construction: turn an
append-only change log into versioned dimension rows with
[valid_from, valid_to) intervals — the warehouse-standard history
shape (Kimball's Type-2 dimension; no reference-repo counterpart, the
reference has no dimensional modeling at all).

Scale shape: two per-key windows (lag to drop no-op changes, lead over
the survivors to close intervals) — both partitioned by the dimension
key, so parallelism is key-cardinality-wide and no global sort or
driver state exists.  The output composes with the repo's join
surface: an as-of/temporal join of facts against the versioned
dimension is a plain equi-join on the key plus an interval predicate
(per-key version lists are small), pinned equivalent to the direct
last-value-window as-of in tests."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    log: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Versioned dimension rows from a change log: one row per RUN of
    equal attribute values per key, with ``valid_from`` = the run's
    first change timestamp and ``valid_to`` = the next run's first
    timestamp (NULL for the current version — the open interval).

    - No-op log entries (attrs equal to the key's previous entry) are
      collapsed away first, so intervals describe VALUE changes, not
      log chatter; the lead window that closes intervals runs over the
      survivors.
    - Attribute equality is null-safe (``eqNullSafe``): a NULL→NULL
      repeat is a no-op, NULL→value and value→NULL are real changes
      (three-valued ``=`` would misclassify all three).
    - ``tiebreak_cols`` orders simultaneous log entries (same key,
      same ts) deterministically; the LAST entry in that order wins
      the instant — earlier same-instant entries produce empty
      [t, t) intervals, which are dropped only by callers that filter
      ``valid_from < valid_to``; the default keeps them so the output
      is a lossless function of the log."""
    order: list[Column] = [F.col(ts_col)] + [F.col(c) for c in tiebreak_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    first = F.lag(ts_col).over(w).isNull()
    runs = log.withColumn("_chg", first | changed).filter(F.col("_chg")).drop("_chg")
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return runs.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    )


def asof_join_scd2(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    ts_col: str,
    how: str = "inner",
) -> DataFrame:
    """Temporal join: each fact row picks the dimension version whose
    [valid_from, valid_to) interval contains its timestamp.  An
    equi-join on the key with the interval predicate as the join
    condition — per-key version lists are small, so this stays a
    hash/sort-merge join on the key, never a global theta join.

    ``how`` is restricted to inner/left (and their semi/anti probe
    forms): the result drops ``dim``'s copy of the key column, so a
    right/full join would strip dim-only rows of their only non-null
    key value — a silently-lossy shape this raises on instead."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"asof_join_scd2: how={how!r} would drop dim-only rows' key "
            "(dim's key column is removed from the output); use "
            "inner/left/semi/anti"
        )
    cond = (
        (facts[key_col] == dim[key_col])
        & (facts[ts_col] >= dim["valid_from"])
        & (dim["valid_to"].isNull() | (facts[ts_col] < dim["valid_to"]))
    )
    # drop the dimension's copy of the key: a condition-style join keeps
    # both sides' columns, and two identically-named key columns make
    # any downstream select/groupBy on the key ambiguous
    return facts.join(dim, cond, how).drop(dim[key_col])
