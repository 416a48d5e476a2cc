"""Operator-level tests: differential sessionization, UDF surface,
lang-id sanity, LSH recall vs brute force."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from clickstreaming_end_to_end_data_engineering_project_spark.functions.udfs import register_udfs
from clickstreaming_end_to_end_data_engineering_project_spark.operators.sessions import (
    sessionize,
    sessionize_via_lag,
)
from clickstreaming_end_to_end_data_engineering_project_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)
from clickstreaming_end_to_end_data_engineering_project_spark.operators.text import (
    lang_id_heuristic,
)
from clickstreaming_end_to_end_data_engineering_project_spark.sources.tables import load


def test_sessionize_equals_lag_formulation_random(spark):
    """Differential: native session_window == lag/cumsum islands on
    adversarial random data (bursts, exact-gap spacing, multi-user)."""
    rng = random.Random(1234)
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user in range(25):
        t = base + dt.timedelta(seconds=rng.randint(0, 3600))
        for _ in range(rng.randint(1, 60)):
            rows.append((eid, t, user))
            eid += 1
            # mix sub-gap, near-gap, exactly-gap and super-gap deltas
            delta = rng.choice([1, 60, 1799, 1800, 1801, 7200])
            t = t + dt.timedelta(seconds=delta, microseconds=rng.randint(0, 999999))
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    native = {tuple(r) for r in sessionize(df, "ts", "user_id").collect()}
    viasql = {tuple(r) for r in sessionize_via_lag(df, "ts", "user_id", 1800, "event_id").collect()}
    assert native == viasql


def test_udf_registration_and_sql_call(spark, sf_dir):
    register_udfs(spark)
    load(spark, sf_dir, "documents").createOrReplaceTempView("_docs_udf")
    row = spark.sql(
        "SELECT max(token_count(text)) AS mx, count(*) AS n FROM _docs_udf"
    ).collect()[0]
    assert row["mx"] > 0 and row["n"] > 0
    load(spark, sf_dir, "embeddings").createOrReplaceTempView("_emb_udf")
    norms = spark.sql("SELECT vector_norm(embedding) AS nrm FROM _emb_udf LIMIT 5").collect()
    assert all(r["nrm"] > 0 for r in norms)


def test_lang_id_runs_and_is_deterministic(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["predicted_lang"] for r in lang_id_heuristic(docs).collect()}
    b = {r["doc_id"]: r["predicted_lang"] for r in lang_id_heuristic(docs).collect()}
    assert a == b and len(a) == docs.count()


def test_lsh_results_subset_of_bruteforce_universe(spark, sf_dir):
    """LSH top-k returns real neighbors (cos values match brute force
    for the ids it returns) — recall may be < 1, correctness must not."""
    embs = load(spark, sf_dir, "embeddings")
    exact = {r["vec_id"]: r["cos_sim"] for r in brute_force_topk(embs, 0, k=500).collect()}
    approx = lsh_topk(embs, 0, k=10).collect()
    assert len(approx) > 0
    for r in approx:
        assert abs(exact[r["vec_id"]] - r["cos_sim"]) < 1e-12
