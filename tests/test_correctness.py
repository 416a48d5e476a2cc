"""Every oracle-backed registry query must match DuckDB; rows-only
queries must at least execute and return a stable schema."""

from __future__ import annotations

import pytest

from clickstreaming_end_to_end_data_engineering_project_spark.plans.registry import all_specs

from .oracle_harness import compare, duck_connection

SPECS = all_specs()
ORACLE_NAMES = [n for n, s in SPECS.items() if s.oracle]
ROWS_ONLY_NAMES = [n for n, s in SPECS.items() if not s.oracle]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, sf_dir, duck, name):
    spec = SPECS[name]
    ok, msg = compare(spec.fn(spark, sf_dir), duck, spec.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
