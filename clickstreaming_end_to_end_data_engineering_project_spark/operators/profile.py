"""Single-pass table profiling — the data-quality surface a warehouse
exposes as DESCRIBE/ANALYZE: per-column null counts and exact distinct
counts, computed in ONE aggregation pass over the table.

Shape: one wide agg row (every per-column statistic is a map-side
partial aggregate; count_distinct adds an Expand but stays one exchange
family), then a narrow ``stack`` unpivot to long format.  At 100 TB
this is exactly the profile job you schedule after a load: a single
scan, no per-column re-reads.  Swap ``approx_count_distinct`` in via
``exact=False`` when 2% error is acceptable and the Expand (one row
replica per profiled column) is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None, exact: bool = True) -> DataFrame:
    """(column_name, row_cnt, null_cnt, distinct_cnt) per profiled
    column.  ``distinct_cnt`` excludes NULLs (SQL COUNT(DISTINCT)
    semantics on both engines)."""
    cols = cols or df.columns
    distinct = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__n_{c}"))
        aggs.append(distinct(F.col(c)).alias(f"__d_{c}"))
    one_row = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', __n_{c}, __d_{c}" for c in cols)
    return one_row.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (column_name, null_cnt, distinct_cnt)",
        "__rows AS row_cnt",
    ).select("column_name", "row_cnt", "null_cnt", "distinct_cnt")
