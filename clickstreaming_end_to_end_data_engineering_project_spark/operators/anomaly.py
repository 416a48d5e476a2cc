"""Z-score anomaly detection over windowed counts.

README.md:123 of the reference promises anomaly detection; nothing is
implemented.  Parity needs only aggregation + global stats: bucket
counts, mean/stddev over buckets, flag |z| > threshold.

Scale note: the global stats reduce to ONE row, so they are joined
back via broadcast cross-join — no single-partition analytic window
over the whole table (a classic scaling trap)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    bucket: str = "minute",
    threshold: float = 2.0,
) -> DataFrame:
    """Buckets whose event count deviates > threshold stddevs from the
    mean bucket count. Output: (bucket_start, event_cnt, zscore)."""
    from ..functions import dround

    counts = df.groupBy(F.date_trunc(bucket, F.col(ts_col)).alias("bucket_start")).agg(
        F.count(F.lit(1)).alias("event_cnt")
    )
    # mean/stddev from exact integer sums (not AVG/STDDEV_SAMP, whose
    # float accumulation order differs across engines): every double op
    # below is reproduced verbatim by the oracle SQL → identical bits.
    stats = counts.agg(
        F.sum("event_cnt").alias("_s"),
        F.sum(F.col("event_cnt") * F.col("event_cnt")).alias("_sq"),
        F.count(F.lit(1)).alias("_n"),
    )
    mu = F.col("_s").cast("double") / F.col("_n")
    sigma = F.sqrt(
        (F.col("_sq") - (F.col("_s").cast("double") * F.col("_s")) / F.col("_n"))
        / (F.col("_n") - 1)
    )
    z = (F.col("event_cnt") - mu) / sigma
    return (
        counts.crossJoin(F.broadcast(stats))
        .filter(F.abs(z) > threshold)
        .select("bucket_start", "event_cnt", dround(z, 4).alias("zscore"))
    )
