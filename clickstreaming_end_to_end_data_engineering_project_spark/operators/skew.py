"""Skew mitigation and co-location utilities.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime; these are the explicit tools for the cases it can't:

- ``salted_join``: pre-split a pathologically hot key across N salt
  buckets.  The big side gets a deterministic per-row salt; the small
  side is replicated N times.  Shuffle load per reducer drops by ~N
  for the hot key at the cost of N-fold replication of the other side
  — use when one key dominates (power-law user ids, null-heavy keys).
- ``write_bucketed`` / ``read_bucketed_join``: persistent bucketing so
  repeated joins/aggregations on the same key shuffle ZERO bytes —
  the classic warehouse trick for fact⋈fact joins too big to
  broadcast and too frequent to re-shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the big side salted N ways.  Result is
    identical to ``big.join(small, key, how)`` for inner/left joins.

    The salt is derived from xxhash64 over the big side's full row
    (deterministic, uniform); the small side carries every salt value
    via a compact explode."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) table: joins and
    aggregations on ``bucket_col`` between tables bucketed the same way
    need no Exchange."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)
