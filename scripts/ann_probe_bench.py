#!/usr/bin/env python
"""Head-to-head ANN probe comparison on a 10× corpus: brute-force
cosine, written-LSH-index probe, IVF over LEARNED k-means clusters,
and written-PQ-index probe (ADC shortlist + exact rerank), each
min-of-3 warm, with recall@10 vs the exact answer — the table that
justifies which probe a serving deployment picks at which scale.
Prints one JSON line for SCALING.md.

Replicas are PERTURBED (each copy's embedding is rotated by i
positions), not cloned: byte-identical clones make every probe
trivially right in the query's bucket and degenerate the tie-break
(and IVF over the synthetic `label` column scored recall 0 — labels
are not geometric clusters, which is exactly why ivf_topk documents
the learned-assignment path this script now exercises).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from clickstreaming_end_to_end_data_engineering_project_spark.operators import (
    similarity as S,
)
from clickstreaming_end_to_end_data_engineering_project_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 10
K = 10


def timed(fn):
    best, result = float("inf"), None
    for _ in range(3):
        t0 = time.perf_counter()
        result = fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3), result


def main() -> None:
    spark = get_spark("ann-bench")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    dims = len(base.select("embedding").first()[0])
    big = base
    for i in range(REPLICAS - 1):
        r = i + 1
        rotated = F.concat(
            F.slice(F.col("embedding"), r + 1, dims - r),
            F.slice(F.col("embedding"), 1, r),
        )
        big = big.unionByName(
            base.withColumn("vec_id", F.col("vec_id") + F.lit(r * 1_000_000))
            .withColumn("embedding", rotated)
        )
    work = tempfile.mkdtemp(prefix="ann_bench_")
    corpus_path = os.path.join(work, "embeddings.parquet")
    big.write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    n = corpus.count()
    qvec = [float(x) for x in corpus.filter(F.col("vec_id") == 0).head()["embedding"]]
    body = corpus.filter(F.col("vec_id") != 0)

    out: dict = {"n_vectors": n, "k": K}

    bf_sec, bf_rows = timed(
        lambda: S.brute_force_topk(corpus, query_vec_id=0, k=K).collect()
    )
    exact_ids = {r["vec_id"] for r in bf_rows}
    out["brute_force"] = {"sec": bf_sec, "recall": 1.0}

    lsh_dir = os.path.join(work, "lsh_index")
    t0 = time.perf_counter()
    S.write_lsh_index(corpus, lsh_dir, planes=4, dims=len(qvec))
    lsh_build = round(time.perf_counter() - t0, 3)
    lsh_sec, lsh_rows = timed(
        lambda: S.lsh_topk_indexed(spark, lsh_dir, query_vec_id=0, k=K).collect()
    )
    out["lsh_indexed"] = {
        "sec": lsh_sec,
        "build_sec": lsh_build,
        "recall": len({r["vec_id"] for r in lsh_rows} & exact_ids) / K,
    }

    from clickstreaming_end_to_end_data_engineering_project_spark.operators.kmeans import (
        kmeans_assign,
    )

    t0 = time.perf_counter()
    clusters = kmeans_assign(corpus, k=16, iterations=2)
    clustered = corpus.join(clusters, "vec_id").localCheckpoint(eager=True)
    ivf_build = round(time.perf_counter() - t0, 3)
    ivf_sec, ivf_rows = timed(
        lambda: S.ivf_topk(
            clustered, query_vec_id=0, k=K, nprobe=4, cluster_col="cluster"
        ).collect()
    )
    out["ivf_kmeans"] = {
        "sec": ivf_sec,
        "build_sec": ivf_build,
        "recall": len({r["vec_id"] for r in ivf_rows} & exact_ids) / K,
    }

    pq_dir = os.path.join(work, "pq_index")
    t0 = time.perf_counter()
    S.write_pq_index(body, pq_dir, m=8, k=16, iterations=2)
    pq_build = round(time.perf_counter() - t0, 3)
    pq_sec, pq_rows = timed(
        lambda: S.pq_topk_indexed(
            spark, pq_dir, body, qvec, k=K, shortlist=100
        ).collect()
    )
    out["pq_indexed"] = {
        "sec": pq_sec,
        "build_sec": pq_build,
        "recall": len({r["vec_id"] for r in pq_rows} & exact_ids) / K,
    }

    # IVF+PQ residual encoding (IVFADC) over the unit-normalized corpus
    # (L2 on the unit sphere = cosine, so recall vs the cosine exact set
    # is apples-to-apples) — the textbook fix for the raw-PQ recall
    # floor measured above
    normed = S.unit_normalize(corpus).localCheckpoint(eager=True)
    nq = [float(x) for x in normed.filter(F.col("vec_id") == 0).head()["embedding"]]
    nbody = normed.filter(F.col("vec_id") != 0)
    t0 = time.perf_counter()
    codes, cents, books = S.ivfpq_build(
        nbody,
        n_clusters=16,
        m=16,
        codes_k=32,
        coarse_iterations=2,
        pq_iterations=2,
        assign_n=4,
    )
    ivfpq_build_sec = round(time.perf_counter() - t0, 3)
    ivfpq_sec, ivfpq_rows = timed(
        lambda: S.ivfpq_topk(
            nbody, codes, cents, books, nq, k=K, nprobe=4, shortlist=200
        ).collect()
    )
    out["ivfpq"] = {
        "sec": ivfpq_sec,
        "build_sec": ivfpq_build_sec,
        "recall": len({r["vec_id"] for r in ivfpq_rows} & exact_ids) / K,
    }

    import shutil

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
