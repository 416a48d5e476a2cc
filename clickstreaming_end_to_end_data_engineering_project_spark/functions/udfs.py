"""UDF registration surface.

The reference leaves a commented hook (`# spark.udf.register(
"custom_function", custom_function)` — stream_processor.py:78-79) and
registers nothing.  This module makes the hook real with the two UDF
tiers the engine supports, in preference order:

1. Built-in expressions (everything in operators/ — not UDFs at all).
2. Arrow-batched pandas UDFs for numeric/vector work Python must do.

Row-at-a-time Python UDFs are deliberately NOT offered a helper: at
100 TB a per-row Python round-trip is the difference between hours and
days; anything expressible over Arrow batches should be a pandas_udf.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, IntegerType


@pandas_udf(IntegerType())
def token_count(text: pd.Series) -> pd.Series:
    """Whitespace token count, vectorized over Arrow batches."""
    return text.str.split().str.len().fillna(0).astype("int32")


@pandas_udf(DoubleType())
def vector_norm(vec: pd.Series) -> pd.Series:
    """L2 norm of an array<float>/array<double> column."""
    import numpy as np

    return vec.map(lambda v: float(np.sqrt(np.dot(v, v))) if v is not None else None)


@pandas_udf(DoubleType())
def geo_mean(values: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (the UDAF tier): geometric mean of
    a positive numeric column, usable in groupBy().agg() and windows.
    Arrow-batched; one Python call per group, not per row."""
    import numpy as np

    v = values.dropna()
    if len(v) == 0:
        return None
    return float(np.exp(np.log(v.astype("float64")).mean()))


try:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, sentence: string")
    class split_sentences:
        """Python UDTF (table function): one row per '.'-terminated
        sentence, for LATERAL joins from SQL.  API-parity surface — the
        hot path for text explosion remains the expression-based
        operators (operators/text.py, dedup.shingles), which stay in
        codegen; a UDTF crosses into Python per input row."""

        def eval(self, text: str):
            if not text:
                return
            for i, s in enumerate(p.strip() for p in text.split(".")):
                if s:
                    yield (i, s)

    _HAS_UDTF = True
except ImportError:  # pragma: no cover - pyspark < 3.5
    _HAS_UDTF = False


def register_udfs(spark: SparkSession) -> None:
    """Expose the UDF family to the SQL surface (the realized version
    of the reference's commented registration hook): scalar pandas
    UDFs, a grouped-agg pandas UDF (UDAF), and a Python UDTF."""
    spark.udf.register("token_count", token_count)
    spark.udf.register("vector_norm", vector_norm)
    spark.udf.register("geo_mean", geo_mean)
    if _HAS_UDTF:
        spark.udtf.register("split_sentences", split_sentences)
