"""Local mirror of the driver's correctness gate: run a registry query
on Spark and its oracle SQL on DuckDB over the same parquet, compare
row count, column names, and an order-insensitive value multiset.

Two comparison paths:

``driver_strict=True`` (default) mirrors the driver: both sides are
pulled through pandas (``DataFrame.toPandas()`` / ``fetchdf()``) and
the *coerced* frames are compared.  This surfaces the type-coercion
hazards the round-3 driver run hit locally first:

  - array/map/struct cells — pandas ``factorize`` raises
    ``unhashable type: 'list'`` in the driver; here it's a clean FAIL;
  - DuckDB HUGEINT (sum of BIGINT) → float64 coercion vs Spark int64
    (``7949.0`` vs ``7949``);
  - DECIMAL objects surviving to the final projection on one side only.

``driver_strict=False`` keeps the Python-native comparison (lists
normalized to tuples) for tail queries that deliberately return array
columns and are never driver-gated.
"""

from __future__ import annotations

import datetime as _dt
import math
import os

import duckdb

from clickstreaming_end_to_end_data_engineering_project_spark.schema import TABLE_NAMES

_EPS = 1e-9


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    import decimal

    if isinstance(v, decimal.Decimal):
        # a Decimal from the oracle vs a float from Spark would compare
        # numerically equal in Python but hash differently in the
        # driver's string-based comparator — surface it as a type token
        return ("DECIMAL", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # FULL repr — the engine contract is bit-identical doubles
        # (decimal-exact sums, identical double pipelines, dround); any
        # ulp drift is a real finding (e.g. JVM-vs-libm ln differs)
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


class _UnhashableCell(Exception):
    """A cell the driver's pandas hasher cannot hash (list/array/dict)."""


def _pnorm(v):
    """Normalize a pandas-coerced cell to a hashable comparison token.

    Applied AFTER ``toPandas()``/``fetchdf()`` so the coercions those
    apply (HUGEINT→float64, nullable int→float64+NaN, …) are part of
    what is compared — exactly like the driver's hasher.
    """
    import decimal

    import numpy as np
    import pandas as pd

    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        raise _UnhashableCell(type(v).__name__)
    if v is None or v is pd.NaT or (v is pd.NA):
        return "NULL"
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, decimal.Decimal):
        return ("DECIMAL", str(v))
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, _dt.datetime):
        # DuckDB fetchdf coerces DATE to datetime64 midnight while
        # Spark toPandas keeps datetime.date — same logical value (the
        # r3 driver run was green on date-output queries, so its hasher
        # tolerates this); canonicalize both to the date form
        if v.tzinfo is None and v.hour == v.minute == v.second == v.microsecond == 0:
            return v.date().isoformat()
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _pandas_rows(pdf) -> list[tuple]:
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        out.append(tuple(_pnorm(v) for v in row))
    return out


def compare(
    spark_df, con: duckdb.DuckDBPyConnection, sql: str, driver_strict: bool = True
) -> tuple[bool, str]:
    if driver_strict:
        return _compare_strict(spark_df, con, sql)
    return _compare_native(spark_df, con, sql)


def _compare_strict(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    spd = spark_df.toPandas()
    dpd = con.execute(sql).fetchdf()
    scols, dcols = sorted(spd.columns), sorted(dpd.columns)
    if scols != dcols:
        return False, f"schema mismatch: spark={scols} duck={dcols}"
    if len(spd) != len(dpd):
        return False, f"rowcount mismatch: spark={len(spd)} duck={len(dpd)}"
    try:
        srows = _pandas_rows(spd)
    except _UnhashableCell as e:
        return False, f"spark result has driver-unhashable cell type: {e} (driver would ERR)"
    try:
        drows = _pandas_rows(dpd)
    except _UnhashableCell as e:
        return False, f"oracle result has driver-unhashable cell type: {e} (driver would ERR)"
    if sorted(srows, key=repr) != sorted(drows, key=repr):
        dset = set(drows)
        sset = set(srows)
        s_only = [r for r in srows if r not in dset][:3]
        d_only = [r for r in drows if r not in sset][:3]
        return False, f"value mismatch (pandas-coerced): spark_only={s_only} duck_only={d_only}"
    return True, f"ok ({len(srows)} rows, driver-strict)"


def _compare_native(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    sdf = spark_df
    scols = sorted(sdf.columns)
    srows = [tuple(_norm(r[c]) for c in scols) for r in sdf.collect()]

    res = con.execute(sql)
    dcols_raw = [d[0] for d in res.description]
    drows_raw = res.fetchall()
    dcols = sorted(dcols_raw)
    idx = [dcols_raw.index(c) for c in dcols]
    drows = [tuple(_norm(r[i]) for i in idx) for r in drows_raw]

    if scols != dcols:
        return False, f"schema mismatch: spark={scols} duck={dcols}"
    if len(srows) != len(drows):
        return False, f"rowcount mismatch: spark={len(srows)} duck={len(drows)}"
    if sorted(srows, key=repr) != sorted(drows, key=repr):
        s_only = [r for r in srows if r not in set(drows)][:3]
        d_only = [r for r in drows if r not in set(srows)][:3]
        return False, f"value mismatch: spark_only={s_only} duck_only={d_only}"
    return True, f"ok ({len(srows)} rows)"
