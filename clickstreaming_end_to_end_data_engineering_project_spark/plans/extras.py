"""Second-ring SQL surface: pivot, GROUPING SETS, percentiles,
regexp extraction, multiset (ALL) set ops.

These round out §2.11's "full SQL read surface" claim — each is a
distinct Catalyst operator family not exercised elsewhere in the
registry (Expand for grouping sets/pivot, sort-based percentiles,
union/intersect with multiplicity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dround, money, sql_snippets
from ..operators import skyline
from ..sources.tables import load
from .registry import QuerySpec

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def weekly_moving_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame moving aggregate: 7-day trailing order revenue per
    day.  rangeBetween on epoch-days (value-based frame, not row
    count) — decimal accumulation keeps it oracle-exact."""
    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("order_day")).agg(
        F.sum(money("o_totalprice")).alias("_rev_dec")
    )
    w = (
        Window.orderBy(F.col("order_day").cast("timestamp").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    # midnight TIMESTAMP output, not DATE — driver-gate dtype
    # discipline (see dau_wau_stickiness)
    return daily.select(
        F.col("order_day").cast("timestamp").alias("order_day"),
        F.col("_rev_dec").cast("double").alias("day_revenue"),
        F.sum("_rev_dec").over(w).cast("double").alias("trailing_7d_revenue"),
    )


def customer_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) over total customer spend (deterministic tiebreak)."""
    orders = load(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(F.sum(money("o_totalprice")).alias("_s_dec"))
    w = Window.orderBy(F.col("_s_dec").desc(), F.col("o_custkey"))
    return spend.select(
        F.col("o_custkey").alias("custkey"),
        F.col("_s_dec").cast("double").alias("total_spend"),
        F.ntile(4).over(w).alias("spend_quartile"),
    )


def user_event_type_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sorted distinct event-type set (array agg + array
    functions surface), emitted as a comma-joined string: the driver
    hashes result cells through pandas, which cannot hash list cells,
    so the gated form must be scalar.  ``user_event_type_arrays``
    keeps the raw ``array<string>`` variant."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("event_types"),
        F.size(F.collect_set("event_type")).alias("n_types"),
    )


def user_event_type_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw array<string> variant of ``user_event_type_sets`` — kept as
    a tail query so the array-output surface stays covered locally
    (tests/oracle_harness.py normalizes lists to tuples)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("event_types"),
        F.size(F.collect_set("event_type")).alias("n_types"),
    )


def order_price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR-fence outlier detection per priority class: orders outside
    [q1 - k*IQR, q3 + k*IQR].  Exact percentiles (sort-based); the
    one-row-per-group fence table broadcasts back.  k=0.5 (not the
    conventional 1.5): fixture prices are near-uniform with no true
    outliers, so wider fences flag nothing at any sf and would reduce
    the oracle check to comparing empty sets."""
    orders = load(spark, sf_dir, "orders")
    fences = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.25).alias("_q1"),
        F.percentile("o_totalprice", 0.75).alias("_q3"),
    )
    lo = F.col("_q1") - 0.5 * (F.col("_q3") - F.col("_q1"))
    hi = F.col("_q3") + 0.5 * (F.col("_q3") - F.col("_q1"))
    return (
        orders.join(F.broadcast(fences), "o_orderpriority")
        .filter((F.col("o_totalprice") < lo) | (F.col("o_totalprice") > hi))
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )


def bigram_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent word pairs by count with PMI score — collocation
    mining over the corpus.  All counts integer-exact; PMI is ln() of
    an identical double on both engines."""
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
    with_toks = docs.select(F.col("doc_id"), toks.alias("_t"))
    m = F.size("_t") - 1
    grams = with_toks.select(
        F.explode(
            F.when(
                F.size("_t") >= 2,
                F.zip_with(
                    F.slice("_t", 1, m), F.slice("_t", 2, m),
                    lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
                ),
            ).otherwise(F.array()),
        ).alias("g")
    ).select("g.w1", "g.w2")
    # grams feeds pair counts, both unigram sides, and N; persist it for
    # the build, materialize the tiny top-20 result, then free the cache
    grams = grams.persist()
    try:
        pair_counts = grams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_cnt"))
        uni = grams.select(F.col("w1").alias("w")).union(
            grams.select(F.col("w2").alias("w"))
        )
        n_df = grams.agg(F.count(F.lit(1)).alias("_n"))  # lazy scalar, no build-time job
        uni_counts = uni.groupBy("w").agg(F.count(F.lit(1)).alias("w_cnt"))
        u1 = uni_counts.select(F.col("w").alias("w1"), F.col("w_cnt").alias("_c1"))
        u2 = uni_counts.select(F.col("w").alias("w2"), F.col("w_cnt").alias("_c2"))
        # PMI = ln(p_xy / (p_x p_y)) with p_xy = c_xy/N and p_w = c_w/(2N)
        # (each pair contributes two unigram tokens) => ln(4N c_xy / (c1 c2)).
        # ln() is NOT correctly-rounded the same way across engines (JVM
        # Math.log vs libm differ by 1 ulp) — unlike sqrt. Fixed-point
        # round the result so the oracle compares stably.
        pmi = dround(
            F.log(
                (F.col("pair_cnt").cast("double") * (4 * F.col("_n")).cast("double"))
                / (F.col("_c1").cast("double") * F.col("_c2"))
            ),
            6,
        )
        return (
            pair_counts.join(u1, "w1").join(u2, "w2")
            .crossJoin(F.broadcast(n_df))
            .select("w1", "w2", "pair_cnt", pmi.alias("pmi"))
            .orderBy(F.col("pair_cnt").desc(), F.col("w1"), F.col("w2"))
            .limit(20)
            .localCheckpoint(eager=True)
        )
    finally:
        grams.unpersist()


def nation_region_nullsafe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): nations
    paired when their NULLIF'd region keys match, nulls matching nulls."""
    nation = load(spark, sf_dir, "nation")
    a = nation.select(F.col("n_nationkey").alias("k_a"), F.nullif("n_regionkey", F.lit(0)).alias("r_a"))
    b = nation.select(F.col("n_nationkey").alias("k_b"), F.nullif("n_regionkey", F.lit(0)).alias("r_b"))
    return (
        a.join(b, a.r_a.eqNullSafe(b.r_b) & (a.k_a < b.k_b))
        .groupBy(F.coalesce(F.col("r_a"), F.lit(-1)).alias("region_group"))
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
    )


def event_split_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with allowMissingColumns: two differently-shaped
    projections recombined by column NAME (positional union would
    silently mismatch) — missing columns null-filled."""
    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", F.col("event_type").alias("kind")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("event_type").alias("kind"), money("value").cast("double").alias("amount")
    )
    u = views.unionByName(purchases, allowMissingColumns=True)
    return u.groupBy("kind").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count("user_id").alias("with_user"),
        F.count("amount").alias("with_amount"),
    )


def doc_cleaned_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-style cleaning chain: strip non-word/space chars,
    collapse whitespace runs, trim — then measure shrinkage."""
    docs = load(spark, sf_dir, "documents")
    cleaned = F.trim(
        F.regexp_replace(F.regexp_replace(F.col("text"), "[^\\w\\s]", ""), "\\s+", " ")
    )
    return docs.select(
        "doc_id",
        F.length("text").alias("raw_len"),
        F.length(cleaned).alias("clean_len"),
    )


def rollup_with_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP + GROUPING() indicator columns (distinguish 'NULL key'
    from 'subtotal row' — the correct way to consume rollups)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            # grouping() only resolves INSIDE the rollup aggregate
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("order_cnt"),
        )
        .select("o_orderstatus", "o_orderpriority", "g_status", "g_priority", "order_cnt")
    )


def ship_delay_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: avg / max days between order and ship date per
    priority (datediff in whole days — integer-exact average)."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return joined.groupBy("o_orderpriority").agg(
        (F.sum(delay).cast("double") / F.count(F.lit(1))).alias("avg_delay_days"),
        F.max(delay).alias("max_delay_days"),
        F.min(delay).alias("min_delay_days"),
    )


def docs_with_long_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order predicates: EXISTS (any token > 8 chars) and
    FORALL (every token alphabetic) per document."""
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
    return docs.select(
        "doc_id",
        F.exists(toks, lambda t: F.length(t) > 8).alias("has_long_token"),
        F.forall(toks, lambda t: t.rlike("^[a-z]+$")).alias("all_alpha"),
    )


def q4_late_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery → left-semi join
    (orders with at least one lineitem shipped after orderdate)."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = orders.join(
        li, (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate), "left_semi"
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


def parts_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery shape: parts priced over the global mean retail
    price.  The scalar aggregate broadcasts (one row).  No headroom
    factor: fixture prices are near-uniform (max ≈ 1.05x mean), so any
    multiplier above that made the result trivially empty."""
    part = load(spark, sf_dir, "part")
    avg_price = part.agg(
        (F.sum(money("p_retailprice")).cast("double") / F.count(F.lit(1))).alias("_avg")
    )
    return (
        part.crossJoin(F.broadcast(avg_price))
        .filter(F.col("p_retailprice") > F.col("_avg"))
        .select("p_partkey", "p_name", "p_retailprice")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+sum scan — the pushdown benchmark.
    All three predicates reach the parquet reader; no shuffle at all
    (single global aggregate)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(money("l_extendedprice") * money("l_discount")).cast("double").alias("promo_revenue"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


def gap_filled_minute_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-minute view counts (time-series resample with zero
    fill): generate the full minute spine with sequence+explode, left
    join the sparse counts.  The spine is tiny (one row per minute) —
    broadcast side — so the fill costs no extra shuffle."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    counts = ev.groupBy(F.date_trunc("minute", F.col("ts")).alias("minute_start")).agg(
        F.count(F.lit(1)).alias("view_count")
    )
    bounds = ev.agg(
        F.date_trunc("minute", F.min("ts")).alias("_lo"),
        F.date_trunc("minute", F.max("ts")).alias("_hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"), F.expr("INTERVAL 1 MINUTE"))).alias(
            "minute_start"
        )
    )
    return spine.join(counts, "minute_start", "left").select(
        "minute_start", F.coalesce(F.col("view_count"), F.lit(0)).alias("view_count")
    )


def event_value_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type → per-type exact value sums, one row per user
    bucket.  Explicit pivot values keep the schema static (required
    for streaming reuse and for plans that don't scan twice)."""
    ev = load(spark, sf_dir, "events").withColumn(
        "user_bucket", (F.col("user_id") % 10).cast("int")
    )
    return (
        ev.groupBy("user_bucket")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.sum(money("value")).cast("double"))
    )


def geo_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer control than rollup/cube) over the
    shared SQL surface — the same text runs on Spark SQL and DuckDB."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_mktsegment", "o_totalprice")
    )
    joined.createOrReplaceTempView("_gs_orders")
    return spark.sql(_GROUPING_SETS_SQL.replace("__TABLE__", "_gs_orders"))


_GROUPING_SETS_SQL = """
SELECT n_name, c_mktsegment,
       count(*) AS order_cnt,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM __TABLE__
GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), ())
"""


def order_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median per priority (sort-based percentile family)."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.median("o_totalprice").alias("median_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


def order_price_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile twin (t-digest/GK sketch — rows-only check,
    sketches differ across engines)."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", [0.25, 0.5, 0.75]).alias("price_quartiles")
    )


def source_number_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract: numeric id out of the source tag."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.withColumn(
            "source_num", F.regexp_extract(F.col("source"), r"(\d+)", 1).cast("int")
        )
        .groupBy("source_num")
        .agg(F.count(F.lit(1)).alias("doc_cnt"), F.sum("n_chars").alias("total_chars"))
    )


def repeat_buyers_both_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset semantics (a customer ordering twice in
    each half keeps multiplicity 2)."""
    orders = load(spark, sf_dir, "orders")
    h1 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select(F.col("o_custkey").alias("c_custkey"))
    h2 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    ).select(F.col("o_custkey").alias("c_custkey"))
    return h1.intersectAll(h2)


def surplus_orders_1996(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — per-customer order surplus of 1996 over 1997."""
    orders = load(spark, sf_dir, "orders")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("c_custkey"))
    y97 = orders.filter(F.year("o_orderdate") == 1997).select(F.col("o_custkey").alias("c_custkey"))
    return y96.exceptAll(y97)


_PIVOT_CASE = ",\n               ".join(
    f"CAST(sum(CASE WHEN event_type = '{t}' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS {t}"
    for t in EVENT_TYPES
)


def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users, TRAILING-7-day active users, and the
    DAU/WAU stickiness ratio — the rolling DISTINCT count product
    dashboards need.

    Scale shape: a rolling distinct cannot use a sum-over-window (the
    same user on two days must count once), and the naive per-day
    re-scan is O(days × corpus).  Instead each distinct (day, user)
    row is SMEARED onto the 7 days it keeps the user active for
    (explode of a 7-element date sequence — a bounded ×7 row
    multiplier), then one count-distinct per day.  Two shuffles total
    (the distinct, the per-day agg), independent of the window length's
    re-scan cost; the inner join back to observed days prunes the
    smear's overhang past the last day."""
    ev = load(spark, sf_dir, "events")
    de = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    dau = de.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    wau = (
        de.select(
            F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias("day"),
            "user_id",
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    # day emitted as midnight TIMESTAMP, not DATE: pandas coerces Spark
    # DateType to datetime.date objects but DuckDB DATE to datetime64,
    # which would hash-mismatch in the driver gate (revenue_by_month's
    # established pattern)
    return dau.join(wau, "day").select(
        F.col("day").cast("timestamp").alias("day"),
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias("stickiness"),
    )


def weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention triangle: users grouped by first-seen
    week, counted active per weeks-since-first — the table behind
    every retention heatmap.

    Scale shape: one distinct on (user, week) (shuffle 1), a per-user
    min-week agg (shuffle 2, key = user so it co-partitions with the
    distinct under AQE), join back on user (same key — no third
    exchange of the big side), final agg on the tiny
    (cohort, offset) key.  Never a self-join of events against
    events, and no per-week re-scan: cost is two passes over the
    distinct (user, week) set regardless of history length."""
    ev = load(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("_week")
    ).distinct()
    first = uw.groupBy("user_id").agg(F.min("_week").alias("_cohort"))
    return (
        uw.join(first, "user_id")
        .select(
            F.col("_cohort").alias("cohort_week"),
            (F.datediff(F.col("_week"), F.col("_cohort")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("active_users"))
    )


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (r13 queue): per customer, recency (days since
    last order vs the corpus max order date), frequency (order count),
    monetary (decimal-exact spend), each bucketed into quartiles — the
    classic CRM segmentation table.

    Quartile assignment deliberately avoids a global ntile (ntile over
    an unpartitioned window sorts ALL customers into ONE task — the
    single-partition trap at 100M customers).  Instead the three
    quartile THRESHOLDS are computed once each (integer-rank
    (p·n+99) div 100 over the per-customer aggregate, the
    length_quantiles discipline), cross-joined back as a broadcast
    1-row frame, and each customer's bucket is 1 + Σ(value > tP) — a
    pure projection, embarrassingly parallel, tie-stable (equal values
    always share a bucket, which ntile cannot promise).  The threshold
    windows still each sort the per-customer aggregate; at true scale
    the serving twin is percentile_approx thresholds (the
    length_quantiles_approx precedent)."""
    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.to_date("o_orderdate")).alias("_last"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(money("o_totalprice")).cast("double").alias("monetary"),
    )
    cmax = orders.agg(F.max(F.to_date("o_orderdate")).alias("_cmax"))
    pc = per_cust.crossJoin(F.broadcast(cmax)).select(
        "custkey",
        F.datediff("_cmax", "_last").cast("bigint").alias("recency_days"),
        "frequency",
        "monetary",
    )

    def thresholds(col: str, prefix: str) -> DataFrame:
        w = Window.orderBy(F.col(col), F.col("custkey"))
        ranked = pc.select(
            F.col(col).alias("_v"),
            F.row_number().over(w).alias("_rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("_n"),
        )
        return ranked.agg(
            *[
                F.max(
                    F.when(
                        F.col("_rn")
                        == F.expr(f"(cast({p} as bigint) * _n + 99) div 100"),
                        F.col("_v"),
                    )
                ).alias(f"{prefix}{p}")
                for p in (25, 50, 75)
            ]
        )

    th = (
        thresholds("recency_days", "_tr")
        .crossJoin(thresholds("frequency", "_tf"))
        .crossJoin(thresholds("monetary", "_tm"))
    )

    def quartile(col: str, pfx: str):
        return (
            F.lit(1)
            + F.when(F.col(col) > F.col(f"{pfx}25"), 1).otherwise(0)
            + F.when(F.col(col) > F.col(f"{pfx}50"), 1).otherwise(0)
            + F.when(F.col(col) > F.col(f"{pfx}75"), 1).otherwise(0)
        ).cast("int")

    return (
        pc.crossJoin(F.broadcast(th))
        .select(
            "custkey",
            "recency_days",
            "frequency",
            "monetary",
            quartile("recency_days", "_tr").alias("r_quartile"),
            quartile("frequency", "_tf").alias("f_quartile"),
            quartile("monetary", "_tm").alias("m_quartile"),
        )
        .withColumn(
            "rfm_segment", F.concat_ws("", "r_quartile", "f_quartile", "m_quartile")
        )
    )


def orders_in_flight_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval accumulation (r16 queue): how many orders
    are IN FLIGHT (placed, not yet fully shipped) on each day.  The
    classic +1/−1 event-sweep: every order emits +1 at its order date
    and −1 the day after its last lineitem shipment; the running sum
    over days is the open-order count.

    Scale shape: two scans (orders, lineitem) → per-order close date
    (one agg on orderkey) → delta aggregation collapses to a
    DAYS-sized frame, and only THAT frame crosses the global ordered
    cumsum (the bounded-by-time-span discipline of
    order_cumulative_revenue).  No interval self-join, no per-day
    explode of the span — an order open 90 days costs 2 rows, not 90."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    close = lineitem.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("_close")
    )
    spans = orders.join(
        close, orders.o_orderkey == close.l_orderkey
    ).select(F.to_date("o_orderdate").alias("_open"), "_close")
    # explode, NOT a union of two selects over spans: the union form
    # plans the orders ⋈ close join once PER BRANCH (two lineitem
    # scans — the digest caught it); the explode emits both deltas
    # from one pass
    deltas = spans.select(
        F.explode(
            F.array(
                F.struct(F.col("_open").alias("day"), F.lit(1).alias("_d")),
                F.struct(
                    F.date_add("_close", 1).alias("day"), F.lit(-1).alias("_d")
                ),
            )
        ).alias("_e")
    ).select("_e.day", "_e._d")
    daily = deltas.groupBy("day").agg(F.sum("_d").alias("net_change"))
    w = Window.orderBy("day")
    return daily.select(
        F.col("day").cast("timestamp").alias("day"),
        "net_change",
        F.sum("net_change").over(w).alias("open_orders"),
    )


# EWMA coefficients: computed ONCE in Python and embedded as literal
# doubles in BOTH engines (repr() round-trips the exact double), so no
# in-engine pow() whose last-ulp could differ.  alpha = 0.3.
_EWMA_DECAY = [0.7**k for k in range(7)]


def daily_revenue_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day exponentially weighted moving average of daily order
    revenue (r16 queue) — the smoothing stage of an anomaly/trend
    dashboard.  EWMA over a FIXED 7-day window with literal decay
    coefficients: ewma = Σ c^k·y_{t-k} / Σ c^k over the lags present
    (leading edge renormalizes instead of zero-filling — standard
    'adjust=True' pandas semantics, restricted to the window).

    Determinism: coefficients are Python-computed literals identical
    in both engines; the numerator/denominator chains are built
    left-to-right the same way; revenue enters as an exact decimal
    sum cast to double; one final division + dround(6)."""
    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(money("o_totalprice")).alias("_rev_dec")
    )
    w = Window.orderBy("day")
    rev = F.col("_rev_dec").cast("double")
    lags = [F.lag(rev, k).over(w) for k in range(7)]
    num = F.lit(0.0)
    den = F.lit(0.0)
    for k, (c, lg) in enumerate(zip(_EWMA_DECAY, lags)):
        num = num + F.lit(c) * F.coalesce(lg, F.lit(0.0))
        den = den + F.lit(c) * F.when(lg.isNotNull(), F.lit(1.0)).otherwise(F.lit(0.0))
    return daily.select(
        F.col("day").cast("timestamp").alias("day"),
        rev.alias("day_revenue"),
        dround(num / den, 6).alias("ewma_revenue"),
    )


def _ewma_oracle() -> str:
    """DuckDB twin of daily_revenue_ewma with the identical literal
    coefficient chain (left-to-right addition order mirrored).  Every
    literal is CAST AS DOUBLE: DuckDB parses bare numeric literals as
    exact DECIMALs and would otherwise run the whole chain in exact
    decimal arithmetic — measured a half-ulp apart from the IEEE
    double chain Spark runs, enough to flip the 6-dp rounding on ~3 of
    2400 days at sf0.1."""
    num = "CAST(0.0 AS DOUBLE)"
    den = "CAST(0.0 AS DOUBLE)"
    for k, c in enumerate(_EWMA_DECAY):
        num = (
            f"({num} + CAST({c!r} AS DOUBLE) * "
            f"coalesce(lag(_rev, {k}) OVER w, CAST(0.0 AS DOUBLE)))"
        )
        den = (
            f"({den} + CAST({c!r} AS DOUBLE) * (CASE WHEN lag(_rev, {k}) OVER w"
            " IS NOT NULL THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))"
        )
    return f"""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   {sql_snippets.sum_money("o_totalprice")} AS _rev
            FROM orders GROUP BY 1
        )
        SELECT CAST(day AS TIMESTAMP) AS day,
               _rev AS day_revenue,
               {sql_snippets.dround(f"{num} / {den}", 6)} AS ewma_revenue
        FROM daily
        WINDOW w AS (ORDER BY day)
        """


def weekly_user_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly distinct users via per-DAY HLL sketches unioned per week
    (operators/sketches.distinct_rollup_hll) — the mergeable-summary
    rollup: one corpus scan, every coarser span a sketch merge.
    Rows-only by nature (DataSketches estimates are implementation-
    defined); exact-twin error bound pinned by
    test_hll_rollup_error_bound (exact twin: count(DISTINCT) per
    week, the dau_wau_stickiness machinery)."""
    from ..operators.sketches import distinct_rollup_hll

    return distinct_rollup_hll(load(spark, sf_dir, "events"))


def weekly_retention_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week retained users via theta-sketch INTERSECTION —
    the set operation HLL cannot express
    (operators/sketches.retention_overlap_theta).  Rows-only; exact
    twin (self-join distinct intersection) bounds the error in
    test_theta_retention_error_bound."""
    from ..operators.sketches import retention_overlap_theta

    return retention_overlap_theta(load(spark, sf_dir, "events"))


def purchase_value_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-value quantiles from per-day KLL sketches merged
    globally (operators/sketches.quantile_rollup_kll) — the
    persistable/re-aggregable alternative to percentile_approx for
    incremental ingest.  Rows-only; rank-error vs the exact sorted
    values bounded by test_kll_quantiles_rank_error_bound."""
    from ..operators.sketches import quantile_rollup_kll

    ev = load(spark, sf_dir, "events")
    return quantile_rollup_kll(
        ev.filter(F.col("event_type") == "purchase"), "ts", "value"
    )


def nation_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation monthly-revenue OLS trend (r15 queue) — 'is this
    market growing and how fast', the regression-in-SQL family: one
    grouped aggregate computes the five sufficient statistics, the
    closed form yields slope and intercept (operators/stats.group_ols).

    x = month index (integer, months since 1992-01), y = the month's
    order revenue as exact DECIMAL — so all five sums are exact and
    the one double division at the end is bit-identical cross-engine
    (see operators/stats.py for the overflow-headroom note)."""
    from ..operators.stats import group_ols

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    monthly = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            (
                (F.year("o_orderdate") - F.lit(1992)) * 12
                + F.month("o_orderdate")
                - 1
            ).alias("_x"),
        )
        .agg(F.sum(money("o_totalprice")).alias("_y_dec"))
    )
    return group_ols(monthly, ["nation"], "_x", "_y_dec").withColumnRenamed(
        "n_points", "n_months"
    )


def events_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (r15, the r17 queue — a NEW
    family: self-maintainable materialized aggregates).  A 100 TB
    deployment never recomputes its daily rollup over all history when
    a day of events lands; it keeps MERGEABLE partials (count + exact
    decimal sum per key) and folds the increment in — the classic
    incremental-view-maintenance contract (Gray et al.'s
    distributive aggregates; every streaming sink's re-agg relies on
    the same algebra, reference stream_processor.py:299-428 re-agg
    SPEC).  This query PROVES the merge: events split 80/20 by a
    content-stable rule into 'history' and 'increment', each rolled up
    independently (the stored-partial shape), then merged by summing
    partials — and the oracle computes the SAME rollup directly over
    all events, so the driver's hash compare enforces
    merge(partial(A), partial(B)) == full(A ∪ B) bit-for-bit.  The
    derived average divides the exact decimal total by the merged
    count at the END (averages are NOT mergeable; their sufficient
    statistics are).  At scale the merge's cost is O(increment +
    affected keys): history partials arrive as a stored table, never
    recomputed (see etl.merge_upsert for landing them copy-on-write).
    """
    ev = load(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.to_date("ts").cast("timestamp").alias("event_date"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(money("value")).alias("_v"),
        )

    base = partial(ev.filter(F.col("event_id") % 10 < 8))
    delta = partial(ev.filter(F.col("event_id") % 10 >= 8))
    return (
        base.unionByName(delta)
        .groupBy("event_date", "event_type")
        .agg(F.sum("_n").alias("n_events"), F.sum("_v").alias("_vm"))
        .select(
            "event_date",
            "event_type",
            "n_events",
            F.col("_vm").cast("double").alias("total_value"),
            (F.col("_vm").cast("double") / F.col("n_events")).alias("avg_value"),
        )
    )


def part_price_size_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of the parts catalog — parts where no other part
    is simultaneously cheaper-or-equal and larger-or-equal with one
    strict (r18 queue, new family: skyline).  The oracle states the
    quadratic NOT EXISTS form; the impl runs the grid-pruned two-phase
    plan (operators/skyline.skyline_2d: bucket prefix-max prune, then
    a same-bucket-only residual anti-join — provably equivalent, see
    the operator docstring).  Pure comparisons on the stored values,
    no arithmetic — engine-exact.  Grid-choice invariance and a
    brute-force differential are pinned in tests."""
    part = load(spark, sf_dir, "part")
    return skyline.skyline_2d(
        part.select("p_partkey", "p_retailprice", "p_size"),
        min_col="p_retailprice",
        max_col="p_size",
    )


def part_pareto_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-criteria Pareto frontier of the parts catalog (r17 queue; r15
    verdict directive #6): parts where no other part is simultaneously
    cheaper-or-equal, larger-or-equal, AND better-documented-or-equal
    (name length as the third criterion) with at least one strict —
    the d ≥ 3 request the 2-D prefix-max plan cannot serve.  The
    oracle states the quadratic NOT EXISTS form; the impl runs the
    cell-grid-pruned plan (operators/skyline.skyline_kd: strict-cell
    broadcast prune, then an equi-keyed residual anti-join over
    surviving cell pairs — provably equivalent, see the operator
    docstring).  Pure comparisons, no arithmetic — engine-exact.
    Grid-choice invariance and a d=3/d=4 brute-force differential are
    pinned in tests."""
    part = load(spark, sf_dir, "part")
    return skyline.skyline_kd(
        part.select(
            "p_partkey",
            "p_retailprice",
            "p_size",
            F.length("p_name").alias("name_len"),
        ),
        [("p_retailprice", "min"), ("p_size", "max"), ("name_len", "max")],
    )


def supplier_shipping_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier shipping coverage (r18 queue, NEW family: interval
    algebra / gaps-and-islands): each line item occupies the supplier
    for a transit interval [ship_date, ship_date + quantity days]
    (the fixture carries no receipt date, so transit scales with
    quantity — deterministic and variable-length, which is what
    exercises real merging); merging each supplier's intervals into
    maximal disjoint busy periods yields how many periods the
    supplier's history decomposes into and how many distinct calendar
    days are covered — 'union of validity ranges', the measure a raw
    per-row sum double-counts wherever shipments overlap.  Runs
    through operators/intervals.interval_coverage (two per-key windows
    + one groupBy, no self-join — see the module docstring for why the
    naive overlap join is quadratic per key); the oracle states the
    identical SQL islands pattern.  Inclusive date arithmetic
    (datediff + 1), all-integer — engine-exact."""
    from ..operators.intervals import interval_coverage

    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.to_date("l_shipdate").alias("ship_day"),
        F.date_add(
            F.to_date("l_shipdate"), F.col("l_quantity").cast("int")
        ).alias("transit_end"),
    )
    return interval_coverage(
        li,
        "l_suppkey",
        "ship_day",
        "transit_end",
        length=(F.datediff("island_end", "island_start") + 1).cast("long"),
    ).withColumnRenamed("covered", "covered_days")


def coverage_order_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Busy-period × order-span overlap join (r19 queue; r17 verdict
    #5 — the interval×interval member the range-join family lacked):
    each supplier's merged shipping islands (the
    ``supplier_shipping_coverage`` intervals) joined to that supplier's
    order in-flight spans ([o_orderdate, last delivery] per
    order × supplier, delivery = ship_day + quantity transit days),
    keeping overlapping pairs and aggregating per island how many
    in-flight orders coincided with it and for how many calendar days
    in total — "which busy periods were load-bearing".  Runs through
    operators/rangejoin.interval_overlap_join (bin-replicated equi-join
    on (suppkey, 30-day bin) + residual, the canonical meeting-bin rule
    deduping multi-bin pairs with NO distinct — see the operator for
    the exactly-once proof); the oracle states the plain theta join.
    Inclusive date arithmetic, all-integer — engine-exact."""
    from ..operators.intervals import merge_intervals
    from ..operators.rangejoin import interval_overlap_join

    li = load(spark, sf_dir, "lineitem")
    islands = merge_intervals(
        li.select(
            "l_suppkey",
            F.to_date("l_shipdate").alias("ship_day"),
            F.date_add(
                F.to_date("l_shipdate"), F.col("l_quantity").cast("int")
            ).alias("transit_end"),
        ),
        "l_suppkey",
        "ship_day",
        "transit_end",
    ).drop("n_intervals")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("placed")
    )
    # span start guards with least(placed, first ship): the synthetic
    # fixture ships some lines BEFORE the order date (min Δ = -2383
    # days at sf0.01), and an inverted span would (correctly) raise in
    # the operator — the guard states the honest semantics instead
    # ("in flight from whichever came first")
    spans = (
        li.select(
            F.col("l_suppkey").alias("s_suppkey"),
            "l_orderkey",
            F.to_date("l_shipdate").alias("shipped"),
            F.date_add(
                F.to_date("l_shipdate"), F.col("l_quantity").cast("int")
            ).alias("delivered"),
        )
        .groupBy("s_suppkey", "l_orderkey")
        .agg(
            F.min("shipped").alias("first_ship"),
            F.max("delivered").alias("span_end"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "s_suppkey",
            "l_orderkey",
            F.least("placed", "first_ship").alias("span_start"),
            "span_end",
        )
    )
    joined = interval_overlap_join(
        islands,
        spans,
        "island_start",
        "island_end",
        "span_start",
        "span_end",
        bin_seconds=86400 * 30,
        keys=[("l_suppkey", "s_suppkey")],
    )
    return joined.groupBy("l_suppkey", "island_start", "island_end").agg(
        F.count(F.lit(1)).alias("n_orders_in_flight"),
        F.sum(
            (
                F.datediff(
                    F.least("island_end", "span_end"),
                    F.greatest("island_start", "span_start"),
                )
                + 1
            ).cast("long")
        ).alias("overlap_days"),
    )


def _nation_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders x customer x nation — the shared input of the r20-queue
    timeseries pair (both dimension joins broadcast)."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    return orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    ).join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])


def nation_daily_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation daily mean order value on a gap-free day grid, with
    linear interpolation over orderless days (r20 queue) — the
    chart-ready repair of a sparse per-key daily series; see
    operators/timeseries.resample_linear for the one-shuffle plan
    shape and the exact-decimal/IEEE determinism contract."""
    from ..operators.timeseries import resample_linear

    return resample_linear(
        _nation_orders(spark, sf_dir),
        "o_orderdate",
        ["n_name"],
        money("o_totalprice"),
        step_seconds=86400,
    )


def nation_monthly_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing of monthly revenue per nation (r20
    queue) — the level+trend upgrade of daily_revenue_ewma, and the
    forecasting primitive a revenue dashboard extrapolates from.
    alpha=0.5, beta=0.3 (Python double literals, mirrored as CAST AS
    DOUBLE in the oracle's recursive CTE); see
    operators/timeseries.holt_smooth for the per-key fold contract."""
    from ..operators.timeseries import holt_smooth

    monthly = (
        _nation_orders(spark, sf_dir)
        .groupBy(
            "n_name", F.trunc("o_orderdate", "month").alias("month")
        )
        .agg(F.sum(money("o_totalprice")).cast("double").alias("revenue"))
        .select("n_name", F.col("month").cast("timestamp").alias("month"), "revenue")
    )
    return holt_smooth(
        monthly, ["n_name"], "month", "revenue", alpha=0.5, beta=0.3
    )


def customer_kanonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk report over the customer table's quasi-
    identifiers (nation, market segment, account-balance band) — the
    privacy-release readout beside the PII scrub (r20 queue); see
    operators/pii.k_anonymity_report."""
    from ..operators.pii import k_anonymity_report

    c = load(spark, sf_dir, "customer")
    return k_anonymity_report(
        c,
        [
            F.col("c_nationkey"),
            F.col("c_mktsegment"),
            F.floor(F.col("c_acctbal") / F.lit(100.0)),
        ],
        k_thresholds=(2, 5, 10),
    )


def _interp_oracle() -> str:
    """DuckDB twin of nation_daily_interpolated: day-index * 86400
    bucket seconds (the operator's epoch arithmetic restated in exact
    integer DATE space), identical window/interpolation trees, one
    dround.  The scaled ratio (d*86400)/(D*86400) is bit-equal to the
    operator's epoch-second ratio: both num and den are exact in
    double and IEEE division correctly rounds the same real
    quotient."""
    interp = (
        "pv + (nv - pv) * (CAST(bsec - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE))"
    )
    return f"""
        WITH obs AS (
            SELECT n_name,
                   (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
                       * CAST(86400 AS BIGINT) AS bsec,
                   {sql_snippets.avg_money('o_totalprice')} AS v
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
            GROUP BY 1, 2
        ), spans AS (
            SELECT n_name, min(bsec) AS lo, max(bsec) AS hi
            FROM obs GROUP BY 1
        ), grid AS (
            SELECT n_name, CAST(x AS BIGINT) AS bsec
            FROM spans, unnest(generate_series(lo, hi, 86400)) t(x)
        ), j AS (
            SELECT g.n_name, g.bsec, o.v
            FROM grid g LEFT JOIN obs o USING (n_name, bsec)
        ), w AS (
            SELECT n_name, bsec, v,
                last_value(CASE WHEN v IS NOT NULL THEN bsec END IGNORE NULLS)
                    OVER wp AS pb,
                last_value(v IGNORE NULLS) OVER wp AS pv,
                first_value(CASE WHEN v IS NOT NULL THEN bsec END IGNORE NULLS)
                    OVER wn AS nb,
                first_value(v IGNORE NULLS) OVER wn AS nv
            FROM j
            WINDOW wp AS (PARTITION BY n_name ORDER BY bsec
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wn AS (PARTITION BY n_name ORDER BY bsec
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT n_name,
               epoch_ms(bsec * 1000) AS bucket,
               {sql_snippets.dround(f'CASE WHEN v IS NOT NULL THEN v ELSE {interp} END', 6)}
                   AS value,
               v IS NOT NULL AS is_observed
        FROM w
        """


def _holt_oracle() -> str:
    """DuckDB twin of nation_monthly_holt: the identical recurrence as
    a recursive CTE over per-nation month indexes.  The level
    expression is restated verbatim inside the trend update (a
    recursive SELECT cannot reference its own computed column) —
    recomputing the same double expression yields the same double.
    All coefficients CAST AS DOUBLE (the EWMA-oracle lesson)."""
    lvl = (
        "CAST(0.5 AS DOUBLE) * x.y"
        " + CAST(0.5 AS DOUBLE) * (r.level + r.trend)"
    )
    return f"""
        WITH RECURSIVE monthly AS (
            SELECT n_name,
                   CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
                   {sql_snippets.sum_money('o_totalprice')} AS y
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2
        ), idx AS (
            SELECT n_name, month, y,
                   row_number() OVER (PARTITION BY n_name ORDER BY month) AS i
            FROM monthly
        ), rec AS (
            SELECT n_name, month, y, i,
                   CAST(NULL AS DOUBLE) AS forecast,
                   y AS level,
                   CAST(0.0 AS DOUBLE) AS trend
            FROM idx WHERE i = 1
            UNION ALL
            SELECT x.n_name, x.month, x.y, x.i,
                   r.level + r.trend AS forecast,
                   {lvl} AS level,
                   CAST(0.3 AS DOUBLE) * (({lvl}) - r.level)
                       + CAST(0.7 AS DOUBLE) * r.trend AS trend
            FROM idx x JOIN rec r ON x.n_name = r.n_name AND x.i = r.i + 1
        )
        SELECT n_name, month, y,
               {sql_snippets.dround('forecast', 6)} AS forecast,
               {sql_snippets.dround('level', 6)} AS level,
               {sql_snippets.dround('trend', 6)} AS trend
        FROM rec
        """


SPECS = [
    QuerySpec(
        "part_pareto_3d",
        part_pareto_3d,
        """
        WITH pts AS (
            SELECT p_partkey, p_retailprice, p_size,
                   length(p_name) AS name_len
            FROM part
            WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
              AND p_name IS NOT NULL
        )
        SELECT p_partkey, p_retailprice, p_size, name_len
        FROM pts a
        WHERE NOT EXISTS (
            SELECT 1 FROM pts b
            WHERE b.p_retailprice <= a.p_retailprice
              AND b.p_size >= a.p_size
              AND b.name_len >= a.name_len
              AND (b.p_retailprice < a.p_retailprice
                   OR b.p_size > a.p_size
                   OR b.name_len > a.name_len)
          )
        """,
        "3-D skyline (Pareto frontier) via cell-grid-pruned plan",
    ),
    QuerySpec(
        "part_price_size_skyline",
        part_price_size_skyline,
        """
        SELECT p_partkey, p_retailprice, p_size
        FROM part a
        WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
          AND NOT EXISTS (
            SELECT 1 FROM part b
            WHERE b.p_retailprice <= a.p_retailprice
              AND b.p_size >= a.p_size
              AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
          )
        """,
        "2-D skyline (Pareto frontier) via grid-pruned two-phase plan",
    ),
    QuerySpec(
        "events_incremental_rollup",
        events_incremental_rollup,
        """
        SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date,
               event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(*)
                   AS avg_value
        FROM events
        GROUP BY 1, 2
        """,
        "incremental aggregate maintenance: merged partials must equal "
        "the direct rollup (r17 queue)",
    ),
    QuerySpec(
        "nation_revenue_trend",
        nation_revenue_trend,
        f"""
        WITH monthly AS (
            SELECT n_name AS nation,
                   (year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS _x,
                   sum(CAST(o_totalprice AS DECIMAL(12,2))) AS _y
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2
        ),
        s AS (
            SELECT nation,
                   count(*) AS n_months,
                   CAST(count(*) AS DOUBLE) AS _n,
                   CAST(sum(_x) AS DOUBLE) AS _sx,
                   CAST(sum(_x * _x) AS DOUBLE) AS _sxx,
                   CAST(sum(_y) AS DOUBLE) AS _sy,
                   CAST(sum(_x * _y) AS DOUBLE) AS _sxy
            FROM monthly GROUP BY 1
        ),
        fit AS (
            SELECT nation, n_months,
                   CASE WHEN _n * _sxx - _sx * _sx <> 0
                        THEN (_n * _sxy - _sx * _sy) / (_n * _sxx - _sx * _sx)
                   END AS _slope,
                   _n, _sx, _sy
            FROM s
        )
        SELECT nation, n_months,
               {sql_snippets.dround("_slope", 6)} AS slope,
               {sql_snippets.dround("(_sy - _slope * _sx) / _n", 6)} AS intercept
        FROM fit
        """,
        "per-nation monthly-revenue OLS slope/intercept from exact "
        "sufficient statistics (r15 queue)",
    ),
    QuerySpec(
        "customer_rfm_segments",
        customer_rfm_segments,
        f"""
        WITH pc AS (
            SELECT o_custkey AS custkey,
                   date_diff('day', CAST(max(o_orderdate) AS DATE),
                             (SELECT CAST(max(o_orderdate) AS DATE) FROM orders))
                       AS recency_days,
                   count(*) AS frequency,
                   {sql_snippets.sum_money('o_totalprice')} AS monetary
            FROM orders GROUP BY 1
        ),
        tr AS (
            SELECT max(CASE WHEN _rn = (25*_n+99)//100 THEN _v END) AS _tr25,
                   max(CASE WHEN _rn = (50*_n+99)//100 THEN _v END) AS _tr50,
                   max(CASE WHEN _rn = (75*_n+99)//100 THEN _v END) AS _tr75
            FROM (SELECT recency_days AS _v,
                         row_number() OVER (ORDER BY recency_days, custkey) AS _rn,
                         count(*) OVER () AS _n FROM pc)
        ),
        tf AS (
            SELECT max(CASE WHEN _rn = (25*_n+99)//100 THEN _v END) AS _tf25,
                   max(CASE WHEN _rn = (50*_n+99)//100 THEN _v END) AS _tf50,
                   max(CASE WHEN _rn = (75*_n+99)//100 THEN _v END) AS _tf75
            FROM (SELECT frequency AS _v,
                         row_number() OVER (ORDER BY frequency, custkey) AS _rn,
                         count(*) OVER () AS _n FROM pc)
        ),
        tm AS (
            SELECT max(CASE WHEN _rn = (25*_n+99)//100 THEN _v END) AS _tm25,
                   max(CASE WHEN _rn = (50*_n+99)//100 THEN _v END) AS _tm50,
                   max(CASE WHEN _rn = (75*_n+99)//100 THEN _v END) AS _tm75
            FROM (SELECT monetary AS _v,
                         row_number() OVER (ORDER BY monetary, custkey) AS _rn,
                         count(*) OVER () AS _n FROM pc)
        ),
        q AS (
            SELECT pc.*,
                   CAST(1 + (CASE WHEN recency_days > _tr25 THEN 1 ELSE 0 END)
                          + (CASE WHEN recency_days > _tr50 THEN 1 ELSE 0 END)
                          + (CASE WHEN recency_days > _tr75 THEN 1 ELSE 0 END) AS INT)
                       AS r_quartile,
                   CAST(1 + (CASE WHEN frequency > _tf25 THEN 1 ELSE 0 END)
                          + (CASE WHEN frequency > _tf50 THEN 1 ELSE 0 END)
                          + (CASE WHEN frequency > _tf75 THEN 1 ELSE 0 END) AS INT)
                       AS f_quartile,
                   CAST(1 + (CASE WHEN monetary > _tm25 THEN 1 ELSE 0 END)
                          + (CASE WHEN monetary > _tm50 THEN 1 ELSE 0 END)
                          + (CASE WHEN monetary > _tm75 THEN 1 ELSE 0 END) AS INT)
                       AS m_quartile
            FROM pc, tr, tf, tm
        )
        SELECT custkey, CAST(recency_days AS BIGINT) AS recency_days,
               CAST(frequency AS BIGINT) AS frequency, monetary,
               r_quartile, f_quartile, m_quartile,
               CAST(r_quartile AS VARCHAR) || CAST(f_quartile AS VARCHAR)
                   || CAST(m_quartile AS VARCHAR) AS rfm_segment
        FROM q
        """,
        "RFM quartile segmentation via broadcast thresholds (r13 queue)",
    ),
    QuerySpec(
        "weekly_retention_cohorts",
        weekly_retention_cohorts,
        """
        WITH uw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week
                    FROM events),
        f AS (SELECT user_id, min(week) AS cohort FROM uw GROUP BY user_id)
        SELECT CAST(cohort AS TIMESTAMP) AS cohort_week,
               CAST(date_diff('day', cohort, uw.week) / 7 AS BIGINT) AS week_offset,
               CAST(count(*) AS BIGINT) AS active_users
        FROM uw JOIN f USING (user_id)
        GROUP BY 1, 2
        """,
        "cohort-retention triangle (first-seen week x weeks-since)",
    ),
    QuerySpec(
        "event_split_union_by_name",
        event_split_union_by_name,
        """
        WITH u AS (
            SELECT event_id, user_id, event_type AS kind, NULL::DOUBLE AS amount
            FROM events WHERE event_type = 'view'
            UNION ALL BY NAME
            SELECT event_id, event_type AS kind,
                   CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS amount
            FROM events WHERE event_type = 'purchase'
        )
        SELECT kind, count(*) AS cnt,
               count(user_id) AS with_user,
               count(amount)  AS with_amount
        FROM u GROUP BY kind
        """,
    ),
    QuerySpec(
        "doc_cleaned_lengths",
        doc_cleaned_lengths,
        """
        SELECT doc_id,
               len(text) AS raw_len,
               len(trim(regexp_replace(regexp_replace(text, '[^\\w\\s]', '', 'g'),
                                       '\\s+', ' ', 'g'))) AS clean_len
        FROM documents
        """,
    ),
    QuerySpec(
        "order_price_outliers",
        order_price_outliers,
        """
        WITH f AS (
            SELECT o_orderpriority,
                   quantile_cont(o_totalprice, 0.25) AS q1,
                   quantile_cont(o_totalprice, 0.75) AS q3
            FROM orders GROUP BY 1
        )
        SELECT o_orderkey, o.o_orderpriority, o_totalprice
        FROM orders o JOIN f ON o.o_orderpriority = f.o_orderpriority
        WHERE o_totalprice < q1 - 0.5 * (q3 - q1)
           OR o_totalprice > q3 + 0.5 * (q3 - q1)
        """,
    ),
    QuerySpec(
        "bigram_collocations",
        bigram_collocations,
        """
        WITH t AS (
            SELECT list_filter(str_split_regex(text, '\\s+'), x -> x <> '') AS tk
            FROM documents
        ), g AS (
            SELECT unnest(list_zip(tk[1:len(tk)-1], tk[2:len(tk)])) AS p
            FROM t WHERE len(tk) >= 2
        ), pairs AS (
            SELECT p[1] AS w1, p[2] AS w2 FROM g
        ), pc AS (
            SELECT w1, w2, count(*) AS pair_cnt FROM pairs GROUP BY 1, 2
        ), uni AS (
            SELECT w, count(*) AS w_cnt
            FROM (SELECT w1 AS w FROM pairs UNION ALL SELECT w2 AS w FROM pairs)
            GROUP BY 1
        ), n AS (SELECT count(*) AS np FROM pairs)
        SELECT w1, w2, pair_cnt,
               floor(ln((CAST(pair_cnt AS DOUBLE) * CAST(4 * np AS DOUBLE))
                  / (CAST(c1.w_cnt AS DOUBLE) * c2.w_cnt)) * 1000000.0 + 0.5)
                  / 1000000.0 AS pmi
        FROM pc
        JOIN uni c1 ON pc.w1 = c1.w
        JOIN uni c2 ON pc.w2 = c2.w
        CROSS JOIN n
        ORDER BY pair_cnt DESC, w1, w2
        LIMIT 20
        """,
    ),
    QuerySpec(
        "nation_region_nullsafe_pairs",
        nation_region_nullsafe_pairs,
        """
        WITH n AS (SELECT n_nationkey AS k, nullif(n_regionkey, 0) AS r FROM nation)
        SELECT COALESCE(a.r, -1) AS region_group, count(*) AS pair_cnt
        FROM n a JOIN n b ON a.r IS NOT DISTINCT FROM b.r AND a.k < b.k
        GROUP BY 1
        """,
    ),
    QuerySpec(
        "weekly_moving_revenue",
        weekly_moving_revenue,
        """
        WITH d AS (
            SELECT CAST(o_orderdate AS DATE) AS order_day,
                   sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_dec
            FROM orders GROUP BY 1
        )
        SELECT CAST(order_day AS TIMESTAMP) AS order_day,
               CAST(rev_dec AS DOUBLE) AS day_revenue,
               CAST(sum(rev_dec) OVER (
                   ORDER BY order_day
                   RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS trailing_7d_revenue
        FROM d
        """,
    ),
    QuerySpec(
        "customer_spend_quartiles",
        customer_spend_quartiles,
        """
        WITH s AS (
            SELECT o_custkey AS custkey,
                   sum(CAST(o_totalprice AS DECIMAL(12,2))) AS s_dec
            FROM orders GROUP BY 1
        )
        SELECT custkey,
               CAST(s_dec AS DOUBLE) AS total_spend,
               ntile(4) OVER (ORDER BY s_dec DESC, custkey) AS spend_quartile
        FROM s
        """,
    ),
    QuerySpec(
        "user_event_type_sets",
        user_event_type_sets,
        """
        SELECT user_id,
               array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types,
               CAST(count(DISTINCT event_type) AS INT) AS n_types
        FROM events GROUP BY user_id
        """,
    ),
    QuerySpec(
        "user_event_type_arrays",
        user_event_type_arrays,
        """
        SELECT user_id,
               list_sort(list(DISTINCT event_type)) AS event_types,
               CAST(count(DISTINCT event_type) AS INT) AS n_types
        FROM events GROUP BY user_id
        """,
        "array-output twin of user_event_type_sets (local harness only; "
        "driver pandas hasher cannot hash list cells)",
        nonscalar=True,
    ),
    QuerySpec(
        "rollup_with_grouping_flags",
        rollup_with_grouping_flags,
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT)   AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               count(*) AS order_cnt
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        """,
    ),
    QuerySpec(
        "ship_delay_by_priority",
        ship_delay_by_priority,
        """
        SELECT o_orderpriority,
               CAST(sum(datediff('day', o_orderdate, l_shipdate)) AS DOUBLE) / count(*)
                   AS avg_delay_days,
               max(datediff('day', o_orderdate, l_shipdate)) AS max_delay_days,
               min(datediff('day', o_orderdate, l_shipdate)) AS min_delay_days
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        """,
    ),
    QuerySpec(
        "docs_with_long_tokens",
        docs_with_long_tokens,
        """
        WITH t AS (
            SELECT doc_id, list_filter(str_split_regex(text, '\\s+'), x -> x <> '') AS tk
            FROM documents
        )
        SELECT doc_id,
               len(list_filter(tk, x -> len(x) > 8)) > 0 AS has_long_token,
               len(list_filter(tk, x -> NOT regexp_matches(x, '^[a-z]+$'))) = 0 AS all_alpha
        FROM t
        """,
    ),
    QuerySpec(
        "q4_late_order_priorities",
        q4_late_order_priorities,
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        """,
    ),
    QuerySpec(
        "parts_above_avg_price",
        parts_above_avg_price,
        """
        SELECT p_partkey, p_name, p_retailprice
        FROM part,
             (SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avgp
              FROM part) a
        WHERE p_retailprice > avgp
        """,
    ),
    QuerySpec(
        "q6_forecast_revenue",
        q6_forecast_revenue,
        """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS promo_revenue,
               count(*) AS line_cnt
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.02 AND 0.06
          AND l_quantity < 24
        """,
    ),
    QuerySpec(
        "gap_filled_minute_views",
        gap_filled_minute_views,
        """
        WITH c AS (
            SELECT date_trunc('minute', ts) AS minute_start, count(*) AS view_count
            FROM events WHERE event_type = 'view' GROUP BY 1
        ), spine AS (
            SELECT unnest(generate_series(
                (SELECT min(minute_start) FROM c),
                (SELECT max(minute_start) FROM c),
                INTERVAL 1 MINUTE)) AS minute_start
        )
        SELECT spine.minute_start,
               COALESCE(view_count, 0) AS view_count
        FROM spine LEFT JOIN c ON spine.minute_start = c.minute_start
        """,
    ),
    QuerySpec(
        "event_value_pivot",
        event_value_pivot,
        f"""
        SELECT CAST(user_id % 10 AS INT) AS user_bucket,
               {_PIVOT_CASE}
        FROM events
        GROUP BY 1
        """,
    ),
    QuerySpec(
        "geo_grouping_sets",
        geo_grouping_sets,
        _GROUPING_SETS_SQL.replace(
            "__TABLE__",
            "(SELECT n_name, c_mktsegment, o_totalprice FROM orders "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey)",
        ),
    ),
    QuerySpec(
        "order_price_quantiles",
        order_price_quantiles,
        """
        SELECT o_orderpriority,
               median(o_totalprice) AS median_price,
               min(o_totalprice)    AS min_price,
               max(o_totalprice)    AS max_price
        FROM orders GROUP BY o_orderpriority
        """,
    ),
    QuerySpec(
        "order_price_quantiles_approx",
        order_price_quantiles_approx,
        None,
        "sketch-based percentiles (rows-only)",
    ),
    QuerySpec(
        "source_number_stats",
        source_number_stats,
        """
        SELECT TRY_CAST(regexp_extract(source, '(\\d+)', 1) AS INT) AS source_num,
               count(*)     AS doc_cnt,
               -- DuckDB sum(BIGINT) is HUGEINT, which fetchdf() coerces to
               -- float64 and the driver hash then sees 7949.0 vs Spark's 7949
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY 1
        """,
    ),
    QuerySpec(
        "repeat_buyers_both_halves",
        repeat_buyers_both_halves,
        """
        SELECT o_custkey AS c_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        INTERSECT ALL
        SELECT o_custkey AS c_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        """,
    ),
    QuerySpec(
        "surplus_orders_1996",
        surplus_orders_1996,
        """
        SELECT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 1996
        EXCEPT ALL
        SELECT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 1997
        """,
    ),
    QuerySpec(
        "dau_wau_stickiness",
        dau_wau_stickiness,
        """
        WITH de AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        dau AS (SELECT day, CAST(count(*) AS BIGINT) AS n_dau FROM de GROUP BY day),
        sm AS (SELECT DISTINCT day + CAST(x AS INTEGER) AS day, user_id
               FROM de, unnest(generate_series(0, 6)) t(x)),
        wau AS (SELECT day, CAST(count(*) AS BIGINT) AS n_wau FROM sm GROUP BY day)
        SELECT CAST(dau.day AS TIMESTAMP) AS day, n_dau AS dau, n_wau AS wau,
               CAST(n_dau AS DOUBLE) / CAST(n_wau AS DOUBLE) AS stickiness
        FROM dau JOIN wau ON dau.day = wau.day
        """,
        "rolling-distinct DAU/WAU + stickiness via the smear trick",
    ),
    QuerySpec(
        "orders_in_flight_daily",
        orders_in_flight_daily,
        """
        WITH close AS (
            SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS _close
            FROM lineitem GROUP BY 1
        ),
        spans AS (
            SELECT CAST(o_orderdate AS DATE) AS _open, _close
            FROM orders JOIN close ON o_orderkey = l_orderkey
        ),
        deltas AS (
            SELECT _open AS day, 1 AS _d FROM spans
            UNION ALL
            SELECT _close + INTERVAL 1 DAY, -1 FROM spans
        ),
        daily AS (SELECT CAST(day AS DATE) AS day, CAST(sum(_d) AS BIGINT) AS net_change
                  FROM deltas GROUP BY 1)
        SELECT CAST(day AS TIMESTAMP) AS day, net_change,
               CAST(sum(net_change) OVER (ORDER BY day) AS BIGINT) AS open_orders
        FROM daily
        """,
        "sweep-line open-order count per day: +1/-1 deltas + days-sized "
        "cumsum, no interval explode (r16 queue)",
    ),
    QuerySpec(
        "daily_revenue_ewma",
        daily_revenue_ewma,
        _ewma_oracle(),
        "7-day EWMA of daily revenue with Python-literal decay "
        "coefficients, leading-edge renormalized (r16 queue)",
    ),
    QuerySpec(
        "weekly_user_hll_rollup",
        weekly_user_hll_rollup,
        None,
        "per-day HLL sketches unioned per week (rows-only: DataSketches "
        "estimates; exact-twin error bound pinned in test_operators.py)",
    ),
    QuerySpec(
        "weekly_retention_theta",
        weekly_retention_theta,
        None,
        "theta-sketch intersection retention (rows-only; exact-twin "
        "error bound pinned)",
    ),
    QuerySpec(
        "purchase_value_kll_quantiles",
        purchase_value_kll_quantiles,
        None,
        "mergeable KLL quantile rollup (rows-only; rank-error bound "
        "pinned)",
    ),
    QuerySpec(
        "supplier_shipping_coverage",
        supplier_shipping_coverage,
        # the identical SQL islands pattern: running max of interval
        # ends flags island starts, a cumulative sum numbers islands;
        # inclusive-date day counts, all-integer — engine-exact
        """
        WITH iv AS (
            SELECT l_suppkey,
                   CAST(l_shipdate AS DATE) AS s,
                   CAST(l_shipdate AS DATE) + CAST(l_quantity AS INT) AS e
            FROM lineitem
            WHERE l_shipdate IS NOT NULL
        ), flagged AS (
            SELECT l_suppkey, s, e,
                   CAST(coalesce(
                       s > max(e) OVER (
                           PARTITION BY l_suppkey ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       TRUE) AS INT) AS new_island
            FROM iv
        ), isl AS (
            SELECT l_suppkey, s, e,
                   sum(new_island) OVER (
                       PARTITION BY l_suppkey ORDER BY s, e
                       ROWS UNBOUNDED PRECEDING) AS island
            FROM flagged
        ), merged AS (
            SELECT l_suppkey, island,
                   min(s) AS island_start, max(e) AS island_end
            FROM isl GROUP BY 1, 2
        )
        SELECT l_suppkey,
               count(*) AS n_islands,
               CAST(sum(island_end - island_start + 1) AS BIGINT)
                   AS covered_days
        FROM merged GROUP BY 1
        """,
        "per-supplier merged shipping intervals (gaps-and-islands coverage)",
    ),
    QuerySpec(
        "coverage_order_overlap_join",
        coverage_order_overlap_join,
        # the oracle states the PLAIN theta join (closed-interval
        # overlap) over the same islands CTE as
        # supplier_shipping_coverage plus per-(supplier, order) spans;
        # the impl runs the binned meeting-bin equi-join — the rewrite
        # is semantics-neutral by the exactly-once proof in
        # operators/rangejoin.interval_overlap_join.  Inclusive date
        # day counts, all-integer — engine-exact.
        """
        WITH iv AS (
            SELECT l_suppkey,
                   CAST(l_shipdate AS DATE) AS s,
                   CAST(l_shipdate AS DATE) + CAST(l_quantity AS INT) AS e
            FROM lineitem
            WHERE l_shipdate IS NOT NULL
        ), flagged AS (
            SELECT l_suppkey, s, e,
                   CAST(coalesce(
                       s > max(e) OVER (
                           PARTITION BY l_suppkey ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       TRUE) AS INT) AS new_island
            FROM iv
        ), isl AS (
            SELECT l_suppkey, s, e,
                   sum(new_island) OVER (
                       PARTITION BY l_suppkey ORDER BY s, e
                       ROWS UNBOUNDED PRECEDING) AS island
            FROM flagged
        ), islands AS (
            SELECT l_suppkey, island,
                   min(s) AS island_start, max(e) AS island_end
            FROM isl GROUP BY 1, 2
        ), spans AS (
            SELECT l.l_suppkey AS s_suppkey, l.l_orderkey,
                   least(CAST(o.o_orderdate AS DATE),
                         min(CAST(l.l_shipdate AS DATE))) AS span_start,
                   max(CAST(l.l_shipdate AS DATE)
                       + CAST(l.l_quantity AS INT)) AS span_end
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2, CAST(o.o_orderdate AS DATE)
        )
        SELECT i.l_suppkey, i.island_start, i.island_end,
               count(*) AS n_orders_in_flight,
               CAST(sum(least(i.island_end, s.span_end)
                        - greatest(i.island_start, s.span_start) + 1)
                    AS BIGINT) AS overlap_days
        FROM islands i JOIN spans s
          ON i.l_suppkey = s.s_suppkey
         AND i.island_start <= s.span_end
         AND s.span_start <= i.island_end
        GROUP BY 1, 2, 3
        """,
        "supplier busy islands x order in-flight spans (interval overlap join)",
    ),
    QuerySpec(
        "nation_daily_interpolated",
        nation_daily_interpolated,
        _interp_oracle(),
        "per-nation daily mean order value, gap-free grid + linear "
        "interpolation (r20 queue)",
    ),
    QuerySpec(
        "nation_monthly_holt",
        nation_monthly_holt,
        _holt_oracle(),
        "Holt level+trend smoothing of monthly nation revenue "
        "(r20 queue)",
    ),
    QuerySpec(
        "customer_kanonymity_report",
        customer_kanonymity_report,
        """
        WITH g AS (
            SELECT c_nationkey, c_mktsegment,
                   floor(c_acctbal / 100.0) AS band,
                   CAST(count(*) AS BIGINT) AS gsz
            FROM customer GROUP BY 1, 2, 3
        )
        SELECT CAST(coalesce(sum(gsz), 0) AS BIGINT) AS total_rows,
               CAST(count(*) AS BIGINT) AS n_groups,
               min(gsz) AS min_k,
               CAST(coalesce(sum(CASE WHEN gsz = 1 THEN gsz END), 0)
                    AS BIGINT) AS singleton_rows,
               CAST(coalesce(sum(CASE WHEN gsz < 2 THEN gsz END), 0)
                    AS BIGINT) AS rows_below_2,
               CAST(coalesce(sum(CASE WHEN gsz < 5 THEN gsz END), 0)
                    AS BIGINT) AS rows_below_5,
               CAST(coalesce(sum(CASE WHEN gsz < 10 THEN gsz END), 0)
                    AS BIGINT) AS rows_below_10
        FROM g
        """,
        "k-anonymity risk report over customer quasi-identifiers "
        "(r20 queue)",
    ),
]
