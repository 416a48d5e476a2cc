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
    # internal aliases are INDEX-based, and the unpivot is built from
    # struct/explode expressions (column labels only ever appear as
    # literals) — profiled column names may contain spaces, quotes,
    # dots, or any other non-identifier characters
    def ref(name: str):
        # backtick-quote so a dotted label is a column, not a struct path
        return df["`" + name.replace("`", "``") + "`"]

    aggs = [F.count(F.lit(1)).alias("__rows")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.when(ref(c).isNull(), 1)).alias(f"__n_{i}"))
        aggs.append(distinct(ref(c)).alias(f"__d_{i}"))
    one_row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"__n_{i}").alias("null_cnt"),
                F.col(f"__d_{i}").alias("distinct_cnt"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return one_row.select(
        F.col("__rows").alias("row_cnt"), F.explode(entries).alias("e")
    ).select("e.column_name", "row_cnt", "e.null_cnt", "e.distinct_cnt")
