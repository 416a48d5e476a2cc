#!/usr/bin/env python
"""Measure the z-order payoff the layout tests only assert structurally:
write the 10× events corpus (a) unordered and (b) z-ordered on
(user_id, ts), then run a point lookup (one user) and a time slice
(one day) against both and report

  - files whose parquet footer min/max stats admit the predicate
    (the skipping bound any stats-pruning scanner gets — computed
    from the footers with pyarrow, deterministic), and
  - Spark wall time (min-of-3, warm session; row-group pruning via
    the pushed filters).

Records the SCALING.md storage-section row. Same box discipline as
bench.py: local[$SPARK_GRAFT_CPUS], sf0.1 events replicated 10x with
distinct event_ids.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from clickstreaming_end_to_end_data_engineering_project_spark.session import get_spark
from clickstreaming_end_to_end_data_engineering_project_spark.sources.formats import (
    write_zordered,
)
from clickstreaming_end_to_end_data_engineering_project_spark.sources.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = 64
REPLICAS = 10


def admitted_files(path: str, col: str, lo, hi) -> int:
    """Files whose [min, max] stats for ``col`` intersect [lo, hi].
    A file with ANY statless row group for ``col`` is admitted
    unconditionally — a sticky flag, not a break, so a statless group
    FOLLOWED by one with stats can't be overwritten into a skippable
    range (r10 review: the earlier break-only form was order-dependent
    and could overcount skipping)."""
    n = 0
    for f in sorted(glob.glob(path + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        fmin, fmax, stats_missing = None, None, False
        for g in range(md.num_row_groups):
            for i in range(md.num_columns):
                c = md.row_group(g).column(i)
                if c.path_in_schema != col:
                    continue
                st = c.statistics
                if st is None or not st.has_min_max:
                    stats_missing = True
                    continue
                smin, smax = st.min, st.max
                # parquet TIMESTAMP stats come back tz-aware; compare naive
                if hasattr(smin, "tzinfo") and smin.tzinfo is not None:
                    smin, smax = smin.replace(tzinfo=None), smax.replace(tzinfo=None)
                fmin = smin if fmin is None else min(fmin, smin)
                fmax = smax if fmax is None else max(fmax, smax)
        if stats_missing or fmin is None or (fmax >= lo and fmin <= hi):
            n += 1
    return n


def timed(df) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        df.count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark("zorder-bench")
    spark.sparkContext.setLogLevel("ERROR")
    base = load(spark, SF_DIR, "events")
    n = base.count()
    tenx = base
    for i in range(REPLICAS - 1):
        tenx = tenx.unionByName(
            base.withColumn("event_id", F.col("event_id") + F.lit((i + 1) * 10_000_000))
        )
    plain_dir = "/tmp/zbench/plain"
    z_dir = "/tmp/zbench/zorder"
    # unordered baseline at the same file count (repartition scatters
    # rows round-robin — the layout a naive parallel write produces)
    tenx.repartition(N_FILES).write.mode("overwrite").parquet(plain_dir)
    t0 = time.perf_counter()
    write_zordered(tenx, z_dir, ["user_id", "ts"], N_FILES)
    z_write_sec = round(time.perf_counter() - t0, 3)

    probe_user = base.select("user_id").first()[0]
    day = base.select(F.to_date("ts").alias("d")).groupBy("d").count().orderBy(
        F.col("count").desc()
    ).first()["d"]
    lo = str(day) + " 00:00:00"
    hi = str(day) + " 23:59:59.999999"

    out: dict = {
        "rows": n * REPLICAS,
        "n_files": N_FILES,
        "z_write_sec": z_write_sec,
    }
    import datetime as dt

    day_lo = dt.datetime.combine(day, dt.time.min)
    day_hi = dt.datetime.combine(day, dt.time.max)
    for name, path in (("plain", plain_dir), ("zorder", z_dir)):
        df = spark.read.parquet(path)
        point = df.filter(F.col("user_id") == probe_user)
        tslice = df.filter(F.col("ts").between(F.lit(lo), F.lit(hi)))
        out[name] = {
            "point_admitted_files": admitted_files(path, "user_id", probe_user, probe_user),
            "slice_admitted_files": admitted_files(path, "ts", day_lo, day_hi),
            "point_sec": timed(point),
            "slice_sec": timed(tslice),
            "point_rows": point.count(),
            "slice_rows": tslice.count(),
        }

    # ---- z-order WITHIN date partitions vs plain date partitioning
    # (r10 verdict #7): the bronze layout etl.py writes is
    # partitionBy(event_date); pin that z-order composes with it —
    # partition pruning picks the dirs, footer stats then skip files
    # INSIDE the probed dir.  Both layouts get the same per-date file
    # count (8 tasks), so admitted-file counts are comparable.
    dated = spark.read.parquet(plain_dir).withColumn("event_date", F.to_date("ts"))
    bronze_plain = "/tmp/zbench/bronze_plain"
    bronze_z = "/tmp/zbench/bronze_z"
    # naive 8-way parallel bronze write: each task holds every date ->
    # 8 unordered files per date dir
    (
        dated.repartition(8, "event_id")
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(bronze_plain)
    )
    n_dates = dated.select("event_date").distinct().count()
    t0 = time.perf_counter()
    write_zordered(
        dated, bronze_z, ["user_id", "ts"], 8 * n_dates, partition_by=["event_date"]
    )
    zp_write_sec = round(time.perf_counter() - t0, 3)
    out["partitioned"] = {"n_dates": n_dates, "z_write_sec": zp_write_sec}
    for name, path in (("bronze_plain", bronze_plain), ("bronze_z", bronze_z)):
        df = spark.read.parquet(path)
        day_dir = os.path.join(path, f"event_date={day}")
        point_day = df.filter(
            (F.col("user_id") == probe_user) & (F.col("event_date") == F.lit(str(day)))
        )
        point_all = df.filter(F.col("user_id") == probe_user)
        total_files = len(glob.glob(path + "/event_date=*/*.parquet"))
        all_admitted = sum(
            admitted_files(d, "user_id", probe_user, probe_user)
            for d in glob.glob(path + "/event_date=*")
        )
        out["partitioned"][name] = {
            "files_total": total_files,
            "day_dir_files": len(glob.glob(day_dir + "/*.parquet")),
            "day_dir_admitted": admitted_files(
                day_dir, "user_id", probe_user, probe_user
            ),
            "all_dates_admitted": all_admitted,
            "point_day_sec": timed(point_day),
            "point_all_sec": timed(point_all),
            "point_day_rows": point_day.count(),
            "point_all_rows": point_all.count(),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
