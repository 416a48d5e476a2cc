#!/usr/bin/env python
"""10x scale sweep OUTSIDE the dedup family (r8, VERDICT item 5).

Builds a 10x-inflated twin of the sf0.1 testdata under /tmp and times
the three priciest TPC-H shapes (q21, q8, q9) plus
doc_token_budget_sample at both scales (min-of-3, count() action),
printing one JSON line with the observed scaling exponent
log(t10/t1)/log(10) per query.

Inflation preserves join semantics instead of naively duplicating rows:
- orders/lineitem are cloned with o_orderkey/l_orderkey offset by
  copy_i * (max_orderkey + 1), so each clone set joins within itself
  (the orders<->lineitem key relationship is intact, 10x the join
  cardinality) while dimension keys (cust/supp/part) are left as-is —
  dims stay fixed-size, which is exactly the 100 TB shape (facts grow,
  dims don't).
- documents are cloned with doc_id offset the same way (token-budget
  sampling groups by lang and cumsums by a per-doc hash — new ids give
  clones distinct sample positions).
Usage: python scripts/scale_sweep_10x.py [--copies 10]

Core-width axis (r9, VERDICT item 2): ``--cores N`` runs the whole
sweep on local[N] with shuffle.partitions=N — the "smaller cluster"
emulation.  Because one process owns one JVM master, the width sweep
is three invocations over a SHARED inflated corpus::

    python scripts/scale_sweep_10x.py --cores 32 --keep-data
    python scripts/scale_sweep_10x.py --cores 16 --reuse-data --keep-data --skip-base
    python scripts/scale_sweep_10x.py --cores 8  --reuse-data --skip-base

``--reuse-data`` skips the (deterministic) inflation build when the
target dir already exists; ``--keep-data`` leaves it for the next
invocation; ``--skip-base`` times only the inflated corpus (the base
legs don't change with the data and only matter for exponents).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from clickstreaming_end_to_end_data_engineering_project_spark.plans.registry import all_specs
from clickstreaming_end_to_end_data_engineering_project_spark.session import get_spark
from clickstreaming_end_to_end_data_engineering_project_spark.sources.tables import load

QUERIES = ["q21_late_sole_suppliers", "q8_market_share", "q9_product_profit",
           "doc_token_budget_sample"]
# --queries overrides the default list (r11: used to sweep the round's
# new operators without disturbing the historical default set)


# every table a swept query might load (events joined the set in r12
# for the conversion-latency sweep: clones offset BOTH user_id and
# event_id, so the user population grows with the corpus — per-user
# history length stays fixed, the realistic growth mode)
SWEPT_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "documents", "embeddings", "events",
)


def build_inflated(spark, src_dir: str, dst_dir: str, copies: int) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    copy_ids = spark.range(copies).withColumnRenamed("id", "_copy")
    max_ok = load(spark, src_dir, "orders").agg(F.max("o_orderkey")).collect()[0][0] + 1
    max_doc = load(spark, src_dir, "documents").agg(F.max("doc_id")).collect()[0][0] + 1
    for name in SWEPT_TABLES:
        df = load(spark, src_dir, name)
        out = os.path.join(dst_dir, f"{name}.parquet")
        if name in ("orders", "lineitem"):
            key = "o_orderkey" if name == "orders" else "l_orderkey"
            df = (
                df.crossJoin(copy_ids)
                .withColumn(key, F.col(key) + F.col("_copy") * F.lit(max_ok))
                .drop("_copy")
            )
        elif name == "documents":
            df = (
                df.crossJoin(copy_ids)
                .withColumn("doc_id", F.col("doc_id") + F.col("_copy") * F.lit(max_doc))
                .drop("_copy")
            )
        elif name == "events":
            max_uid = df.agg(F.max("user_id")).collect()[0][0] + 1
            max_eid = df.agg(F.max("event_id")).collect()[0][0] + 1
            df = (
                df.crossJoin(copy_ids)
                .withColumn("user_id", F.col("user_id") + F.col("_copy") * F.lit(max_uid))
                .withColumn("event_id", F.col("event_id") + F.col("_copy") * F.lit(max_eid))
                .drop("_copy")
            )
        elif name == "embeddings":
            # clone with offset ids AND rotated vectors (the
            # ann_probe_bench discipline: byte-identical clones would
            # degenerate similarity geometry; vec_id 0 stays the
            # canonical query vector in copy 0 only)
            max_vec = df.agg(F.max("vec_id")).collect()[0][0] + 1
            dims = len(df.select("embedding").first()[0])
            df = (
                df.crossJoin(copy_ids)
                .withColumn(
                    "embedding",
                    F.when(F.col("_copy") == 0, F.col("embedding")).otherwise(
                        F.concat(
                            F.expr(f"slice(embedding, pmod(_copy, {dims}) + 1, "
                                   f"{dims} - pmod(_copy, {dims}))"),
                            F.expr(f"slice(embedding, 1, pmod(_copy, {dims}))"),
                        )
                    ),
                )
                .withColumn("vec_id", F.col("vec_id") + F.col("_copy") * F.lit(max_vec))
                .drop("_copy")
            )
        df.write.mode("overwrite").parquet(out)


def time_queries(
    spark, specs, sf_dir: str, reps: int = 3, action: str = "count"
) -> dict[str, float]:
    out = {}
    for name in QUERIES:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            df = specs[name].fn(spark, sf_dir)
            if action == "noop":
                # evaluates every output column (bench.py's extended-leg
                # action) — use for queries whose expensive operators
                # don't change the row count and would be PRUNED under
                # count() (the r15 benchmark-honesty lesson)
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--base", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int, default=None,
                    help="local[N] width for the timed runs (default: env/32)")
    ap.add_argument("--reuse-data", action="store_true",
                    help="skip inflation if the target dir already exists")
    ap.add_argument("--keep-data", action="store_true",
                    help="leave the inflated corpus on disk for reuse")
    ap.add_argument("--skip-base", action="store_true",
                    help="time only the inflated corpus (no exponent)")
    ap.add_argument("--reps", type=int, default=3,
                    help="min-of-N timing reps (lower for very large corpora)")
    ap.add_argument("--queries", default=None,
                    help="comma-separated registry names overriding the default sweep set")
    ap.add_argument("--action", default="count", choices=["count", "noop"],
                    help="timing action; noop-write evaluates every output column "
                         "(use when the expensive operator does not change row count)")
    args = ap.parse_args()
    if args.queries:
        global QUERIES
        QUERIES = args.queries.split(",")
    spark = get_spark("scale_sweep", cpus=str(args.cores) if args.cores else None)
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    dst = f"/tmp/sweep{args.copies}x"
    if not (args.reuse_data and os.path.isdir(dst)):
        build_inflated(spark, args.base, dst, args.copies)
    try:
        # warm up both datasets' footers + JVM
        load(spark, args.base, "lineitem").count()
        load(spark, dst, "lineitem").count()
        t1 = (None if args.skip_base
              else time_queries(spark, specs, args.base, args.reps, args.action))
        t10 = time_queries(spark, specs, dst, args.reps, args.action)
    finally:
        if not args.keep_data:
            shutil.rmtree(dst, ignore_errors=True)
    import math

    report = {
        name: {
            **({} if t1 is None else {"base_sec": t1[name]}),
            f"x{args.copies}_sec": t10[name],
            **(
                {}
                if t1 is None
                else {
                    "growth": round(t10[name] / t1[name], 2),
                    "exponent": round(
                        math.log(t10[name] / t1[name]) / math.log(args.copies), 2
                    ),
                }
            ),
        }
        for name in QUERIES
    }
    report["_cores"] = int(args.cores or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    report["_action"] = args.action
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
