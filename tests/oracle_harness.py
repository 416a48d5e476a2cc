"""Local mirror of the driver's correctness gate: run a registry query
on Spark and its oracle SQL on DuckDB over the same parquet, compare
row count, column names, and an order-insensitive value multiset."""

from __future__ import annotations

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


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
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
