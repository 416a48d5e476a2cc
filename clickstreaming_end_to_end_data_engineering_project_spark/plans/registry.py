"""Query registry: name → batch callable + DuckDB oracle SQL.

Every operator claimed in SURVEY.md §2 has a named query here; the
driver runs the Spark callable and the oracle side-by-side at sf0.01
(row count + schema + order-insensitive value hash).  Specs with
``oracle=None`` are hash-function-dependent (MinHash/SimHash/LSH) and
get the weaker rows-only check.

Column-name discipline: every computed column is aliased identically
in the DataFrame code and the SQL (the driver sorts columns by name
before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""


def all_specs() -> dict[str, QuerySpec]:
    from . import clickstream, extras, funnel, llmdata, tpch

    specs: dict[str, QuerySpec] = {}
    for mod in (clickstream, tpch, llmdata, funnel, extras):
        for spec in mod.SPECS:
            if spec.name in specs:
                raise ValueError(f"duplicate query name: {spec.name}")
            specs[spec.name] = spec
    return specs


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle}
