"""Every oracle-backed registry query must match DuckDB; rows-only
queries must at least execute and return a stable schema."""

from __future__ import annotations

import pytest

from clickstreaming_end_to_end_data_engineering_project_spark.plans.registry import all_specs

from .oracle_harness import compare, duck_connection

SPECS = all_specs()
ORACLE_NAMES = [n for n, s in SPECS.items() if s.oracle]
ROWS_ONLY_NAMES = [n for n, s in SPECS.items() if not s.oracle]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.fixture(scope="module", autouse=True)
def _no_cache_leaks_across_the_registry(spark):
    """Global persist-discipline invariant: after EVERY registry query
    in this module has run, the SQL cache manager must be empty — any
    operator that persists an intermediate without unpersisting it
    would accumulate executor storage across a long registry run (the
    dedup-specific leak test pins the known-risky paths; this pins the
    whole surface, at zero extra query cost)."""
    spark.catalog.clearCache()
    yield
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty(), (
        "a registry query left a DataFrame in the SQL cache manager"
    )


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, sf_dir, duck, name):
    spec = SPECS[name]
    # driver-strict (pandas-coerced) for everything the driver could
    # gate; Python-native for deliberate array-output tail queries
    ok, msg = compare(spec.fn(spark, sf_dir), duck, spec.oracle, driver_strict=not spec.nonscalar)
    assert ok, f"{name}: {msg}"


def test_registry_gate_is_exactly_gate_priority():
    """The driver records CORRECTNESS for only the first 50 registry
    entries; GATE_PRIORITY must fill those slots exactly (rotation
    policy documented in registry.py), every gated query must be
    oracle-backed EXCEPT the explicitly-allowed rows-only slots (the
    r10 verdict directed gating embedding_ivf_topk_learned rows-only —
    kmeans float averaging is not SQL-replayable — and ivfpq_topk_probe
    follows the same rationale for its float-trained PQ codebooks; the
    driver records the weaker rows-only check for oracle-less entries),
    and none may be flagged non-scalar."""
    from clickstreaming_end_to_end_data_engineering_project_spark.plans.registry import (
        DRIVER_GATE_SLOTS,
        GATE_PRIORITY,
    )

    # page_backbone_kcore joined r18 (r17 verdict suggestion): an
    # iterative k-core fixpoint no single SQL statement states; its
    # exactness is pinned by the DuckDB-rebuild + pure-python-peeler
    # differential in tests/test_plans.py
    allowed_rows_only = {
        "embedding_ivf_topk_learned",
        "ivfpq_topk_probe",
        "page_backbone_kcore",
    }
    specs = list(all_specs().values())
    gated = specs[:DRIVER_GATE_SLOTS]
    assert [s.name for s in gated] == GATE_PRIORITY
    assert {s.name for s in gated if not s.oracle} <= allowed_rows_only, [
        s.name for s in gated if not s.oracle
    ]
    assert not any(s.nonscalar for s in gated), [s.name for s in gated if s.nonscalar]


_DRIVER_HASHABLE = (
    "string",
    "int",
    "bigint",
    "smallint",
    "tinyint",
    "double",
    "float",
    "boolean",
    "date",
    "timestamp",
    "timestamp_ntz",
)


def test_gated_schemas_are_driver_hashable(spark, sf_dir):
    """Round-3 driver fail #1 was an array<string> cell ERRing the
    driver's pandas hasher.  Every gated query's Spark schema must
    contain only scalar driver-hashable types — no array/map/struct,
    and no DECIMAL surviving to the final projection (DuckDB fetchdf
    coerces DECIMAL differently than Spark's toPandas)."""
    from clickstreaming_end_to_end_data_engineering_project_spark.plans.registry import (
        DRIVER_GATE_SLOTS,
    )

    gated = list(all_specs().values())[:DRIVER_GATE_SLOTS]
    bad = []
    for spec in gated:
        for field in spec.fn(spark, sf_dir).schema.fields:
            t = field.dataType.simpleString()
            if t not in _DRIVER_HASHABLE:
                bad.append(f"{spec.name}.{field.name}: {t}")
    assert not bad, f"non-driver-hashable gated output columns: {bad}"


def test_strict_harness_fails_on_array_cells(spark, duck):
    """Regression for round-3 driver ERR `unhashable type: 'list'`:
    the strict harness must FAIL (not pass) when a result carries
    array cells, exactly as the driver's hasher would."""
    duck.execute("CREATE OR REPLACE VIEW _arr AS SELECT [1, 2] AS xs, 1 AS k")
    sdf = spark.sql("SELECT array(1, 2) AS xs, 1 AS k")
    ok, msg = compare(sdf, duck, "SELECT xs, k FROM _arr", driver_strict=True)
    assert not ok and "driver-unhashable" in msg, msg
    # the native path (tail-query mode) still compares them by value
    ok, _ = compare(sdf, duck, "SELECT xs, CAST(k AS INT) AS k FROM _arr", driver_strict=False)
    assert ok


def test_strict_harness_fails_on_hugeint_sum_coercion(spark, duck):
    """Regression for round-3 driver fail #2: DuckDB sum(BIGINT) yields
    HUGEINT which fetchdf() coerces to float64 (7949.0) while Spark
    returns int64 (7949) — numerically equal, hash-distinct.  The
    strict harness must catch it; CAST(... AS BIGINT) fixes it."""
    duck.execute("CREATE OR REPLACE VIEW _t AS SELECT * FROM (VALUES (1, 100), (1, 200)) v(g, n)")
    sdf = spark.createDataFrame([(1, 300)], "g int, total bigint")
    uncast = "SELECT CAST(g AS INT) AS g, sum(CAST(n AS BIGINT)) AS total FROM _t GROUP BY g"
    ok, msg = compare(sdf, duck, uncast, driver_strict=True)
    assert not ok, f"expected HUGEINT→float64 mismatch to fail: {msg}"
    cast = (
        "SELECT CAST(g AS INT) AS g, CAST(sum(CAST(n AS BIGINT)) AS BIGINT) AS total "
        "FROM _t GROUP BY g"
    )
    ok, msg = compare(sdf, duck, cast, driver_strict=True)
    assert ok, msg


@pytest.mark.parametrize(
    ("name", "min_rows"),
    [("exact_dup_docs", 1), ("embedding_label_pairs", 1)],
)
def test_sparse_gate_queries_nonzero_at_sf01(spark, name, min_rows):
    """Round-5 verdict: these two gate rows were green-with-0-rows at
    the driver's sf0.01 — correct but weak evidence.  Pin NONZERO
    oracle-exact behavior at sf0.1, where the corpus has byte-identical
    dups (8 groups) and within-label cosine pairs.

    (embedding_label_pairs is additionally nonzero at sf0.01 since the
    round-6 threshold recalibration to 0.35; exact_dup_docs cannot be —
    the sf0.01 corpus simply contains no byte-identical documents.)"""
    sf01 = "/root/testdata/sf0.1"
    spec = SPECS[name]
    df = spec.fn(spark, sf01)
    assert df.count() >= min_rows, f"{name} still trivial at sf0.1"
    con = duck_connection(sf01)
    try:
        ok, msg = compare(df, con, spec.oracle, driver_strict=True)
    finally:
        con.close()
    assert ok, f"{name} @ sf0.1: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


@pytest.fixture(scope="module", autouse=True)
def _no_cached_dataframes_leak(spark):
    """After every registry query in this module has executed: no
    operator may leave a persisted DataFrame behind (the driver runs
    the whole registry in one session, so leaked caches would
    accumulate for its entire run).  localCheckpoint blocks are
    RDD-level, GC-reclaimed, and small (query results), so the SQL
    cache manager is the contract surface.  A module-scoped finalizer
    (not a name-ordered test) so it holds under pytest randomization
    or xdist distribution."""
    yield
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "a registry query left a persisted DataFrame behind"
    )


def test_event_time_queries_survive_foreign_session_timezone(spark, sf_dir, duck):
    """The driver owns its SparkSession and may carry any timezone;
    event-time queries must still match the oracle because the loader
    forces UTC (runtime conf) on every access."""
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        for name in [
            "page_view_counts",
            "revenue_by_month",
            "daily_event_stats",
            "dau_wau_stickiness",  # to_date() is session-tz-sensitive
            "hourly_event_stats",
            "user_sessions",
            "anomaly_minutes",
            "gap_filled_minute_views",
            "weekly_moving_revenue",
            "q1_pricing_summary",  # string-literal timestamp bounds
        ]:
            # re-poison before EVERY query: the loader resets to UTC, so
            # setting once would only exercise the first iteration
            spark.conf.set("spark.sql.session.timeZone", "America/New_York")
            spec = SPECS[name]
            ok, msg = compare(spec.fn(spark, sf_dir), duck, spec.oracle)
            assert ok, f"{name} under foreign tz: {msg}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
