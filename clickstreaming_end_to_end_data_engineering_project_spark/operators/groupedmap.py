"""Grouped-map transforms via ``applyInPandas`` (stateless cousin of
the stateful operator in streaming/stateful.py).

Use case shape: per-group numeric transforms that need the WHOLE group
in one pandas frame — normalization, per-group model scoring, rank
transforms.  Each group becomes one Arrow batch on one executor, so
group size must fit executor memory: partition-prune or pre-split
giant groups (the same constraint any grouped-map carries).

The example operator (per-group z-score normalization) exists in pure
expressions too (groupBy stats + join back); the pandas form is the
template for logic that ISN'T expressible — sklearn scoring, scipy
stats — while the test pins it against the expression twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

NORMALIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("lang", StringType(), True),
        StructField("n_chars", LongType(), True),
        StructField("z_chars", DoubleType(), True),
    ]
)


def normalize_per_group(df: DataFrame, group_col: str = "lang") -> DataFrame:
    """Per-group z-score of n_chars computed inside pandas (ddof=1,
    matching stddev_samp)."""

    def _norm(pdf):
        mu = pdf["n_chars"].mean()
        sigma = pdf["n_chars"].std(ddof=1)
        out = pdf[["doc_id", "lang", "n_chars"]].copy()
        out["z_chars"] = (pdf["n_chars"] - mu) / sigma if sigma and sigma > 0 else 0.0
        return out

    return df.select("doc_id", group_col, "n_chars").groupBy(group_col).applyInPandas(
        _norm, NORMALIZED_SCHEMA
    )


def normalize_per_group_expr(df: DataFrame, group_col: str = "lang") -> DataFrame:
    """Expression twin (groupBy stats joined back) for differential
    testing and for when the transform IS expressible."""
    stats = df.groupBy(group_col).agg(
        F.avg("n_chars").alias("_mu"), F.stddev_samp("n_chars").alias("_sigma")
    )
    return (
        df.join(stats, group_col)
        .select(
            "doc_id",
            group_col,
            "n_chars",
            ((F.col("n_chars") - F.col("_mu")) / F.col("_sigma")).alias("z_chars"),
        )
    )
