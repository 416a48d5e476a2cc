#!/usr/bin/env python
"""Per-batch cost curve for streaming near-dedup (r9, VERDICT item 6).

``streaming/near_dedup.NearDedupIngest`` claims flat-ish per-batch cost
as the band store grows (state ~100 B/doc, the seen-bucket lookup is a
columnar semi join — never driver memory).  This script measures that
claim instead of arguing it: the sf0.1 documents corpus is cloned
``--copies`` times (doc_id offset per copy — every clone is a
byte-identical near-dup of its original, the adversarial case where
almost every later batch drops ~90% of its rows) and ingested in
``--batches`` id-range micro-batches through the foreachBatch callable
directly, timing each call while the store grows.

Prints one JSON line: per-batch seconds, survivors, and the store row
count after each batch.  A healthy curve is flat-to-slowly-rising
per-batch time while store rows grow linearly.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from clickstreaming_end_to_end_data_engineering_project_spark.session import get_spark
from clickstreaming_end_to_end_data_engineering_project_spark.sources.tables import load
from clickstreaming_end_to_end_data_engineering_project_spark.streaming.near_dedup import (
    NearDedupIngest,
    read_survivors,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--base", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    spark = get_spark("near-dedup-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, args.base, "documents")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    copy_ids = spark.range(args.copies).withColumnRenamed("id", "_copy")
    corpus = (
        docs.crossJoin(copy_ids)
        .withColumn("doc_id", F.col("doc_id") + F.col("_copy") * F.lit(max_doc))
        .drop("_copy")
    )
    n_docs = args.copies * docs.count()
    span = max_doc * args.copies // args.batches + 1

    root = tempfile.mkdtemp(prefix="nd_sweep_")
    store, out = os.path.join(root, "store"), os.path.join(root, "out")
    sink = NearDedupIngest(store, out, run_id="sweep")
    # materialize the corpus once so batch filters don't re-run the clone join
    corpus = corpus.persist()
    corpus.count()
    curve = []
    try:
        for i in range(args.batches):
            lo, hi = i * span, (i + 1) * span
            batch = corpus.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            t0 = time.perf_counter()
            sink(batch, i)
            sec = round(time.perf_counter() - t0, 3)
            store_rows = spark.read.parquet(store).count()
            curve.append({"batch": i, "sec": sec, "store_rows": store_rows})
        survivors = read_survivors(spark, out).count()
        print(json.dumps({
            "n_docs": n_docs,
            "batches": args.batches,
            "survivors": survivors,
            "first3_sec": [c["sec"] for c in curve[:3]],
            "last3_sec": [c["sec"] for c in curve[-3:]],
            "final_store_rows": curve[-1]["store_rows"],
            "curve": curve,
        }))
    finally:
        corpus.unpersist()
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
