#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count() action — forces the full
plan without driver-side row materialization skewing the numbers; the
first query absorbs JVM/codegen warm-up, reported separately as
"warmup_sec").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clickstreaming_end_to_end_data_engineering_project_spark.plans.registry import all_specs
from clickstreaming_end_to_end_data_engineering_project_spark.session import get_spark

HEADLINE = [
    # clickstream parity
    "page_view_counts",
    "user_sessions",
    "purchase_stats",
    "hourly_event_stats",
    "user_journey_transitions",
    "anomaly_minutes",
    # general SQL
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "top3_parts_per_brand",
    "revenue_rollup_region_nation",
    # llm-data pipeline
    "word_freq_top20",
    "ngram_jaccard_dups",
    "minhash_lsh_dups",
    "embedding_topk_cosine",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    # warm up JVM + parquet footer cache on a tiny action
    t0 = time.perf_counter()
    specs["page_view_counts"].fn(spark, sf_dir).count()
    warmup = time.perf_counter() - t0

    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):  # min-of-3: damp scheduler/load noise (~±10% observed)
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    stream_eps = _stream_throughput(spark, sf_dir)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "warmup_sec": round(warmup, 3),
                "n_queries": len(timings),
                "stream_events_per_sec": stream_eps,
            }
        )
    )
    spark.stop()


def _stream_throughput(spark, sf_dir: str) -> float:
    """Events/sec through the page-view streaming pipeline: full events
    table via the file-stream source, availableNow, counted via the
    progress listener (same measurement the reference's dead monitor
    intended — rows / trigger-execution time)."""
    import shutil
    import tempfile

    from clickstreaming_end_to_end_data_engineering_project_spark.sources.tables import load
    from clickstreaming_end_to_end_data_engineering_project_spark.streaming.monitoring import (
        attach_monitor,
        detach_monitor,
    )
    from clickstreaming_end_to_end_data_engineering_project_spark.streaming.pipelines import (
        page_view_pipeline,
        read_file_stream,
    )

    src_dir = tempfile.mkdtemp(prefix="bench_stream_")
    ckpt = tempfile.mkdtemp(prefix="bench_ckpt_")
    try:
        events = load(spark, sf_dir, "events")
        events.write.mode("overwrite").parquet(src_dir)
        mon = attach_monitor(spark)
        q = (
            page_view_pipeline(read_file_stream(spark, src_dir, events.schema))
            .writeStream.outputMode("update")
            .format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        time.sleep(2)  # listener delivery is async
        rows = sum(p.num_input_rows for p in mon.progress)
        secs = sum(p.duration_ms for p in mon.progress) / 1000.0
        detach_monitor(spark, mon)
        return round(rows / secs, 1) if secs > 0 else 0.0
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


if __name__ == "__main__":
    main()
