"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``clickstreaming_end_to_end_data_engineering_project_spark``
package; this module is a thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clickstreaming_end_to_end_data_engineering_project_spark.plans import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (1-minute tumbling page-view counts, the
    reference's pipeline #1) on /root/testdata/sf0.001."""
    from clickstreaming_end_to_end_data_engineering_project_spark.plans.clickstream import page_view_counts

    return page_view_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; hash-dependent ops (MinHash/SimHash/LSH) are
    intentionally absent → rows-only check."""
    return _registry.oracle_sql()
