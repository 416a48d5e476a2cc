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
    """Registry in driver-gate order.

    The driver records CORRECTNESS entries for only the FIRST 50
    registry queries, so insertion order decides which get hard driver
    verification.  Policy: oracle-backed specs first (rows-only,
    hash-function-dependent specs last), and within the oracle-backed
    block the modules the driver has not yet verified (funnel, extras,
    llmdata) ahead of the round-1-verified ones (tpch, clickstream).
    Every oracle-backed query additionally gets the identical
    rows+schema+value check locally in tests/test_correctness.py, so
    the >50 tail is still covered — just not driver-recorded.
    """
    from . import clickstream, extras, funnel, llmdata, tpch

    specs: dict[str, QuerySpec] = {}
    for mod in (funnel, extras, llmdata, tpch, clickstream):
        for spec in mod.SPECS:
            if spec.name in specs:
                raise ValueError(f"duplicate query name: {spec.name}")
            specs[spec.name] = spec
    # stable sort: oracle-backed keep module order, rows-only sink to the end
    return {s.name: s for s in sorted(specs.values(), key=lambda s: s.oracle is None)}


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle}
