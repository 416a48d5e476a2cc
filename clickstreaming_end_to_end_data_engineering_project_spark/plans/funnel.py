"""Funnel / journey / non-equi-join queries — the analyses the
reference's README promises for its dashboard (README.md:119-146:
"conversion funnels", "user journey flows") but never implements, and
the join surface SURVEY.md §2.3 notes is absent from the reference.

Scale notes:
- conversion_funnel: three narrow aggregates over one scan each,
  joined on user_id (AQE will broadcast the shrinking sides); final
  counts are single rows cross-joined — no wide shuffle.
- price_band_counts: theta join against a tiny literal band table →
  broadcast nested-loop join, the correct plan for non-equi small-dim.
- purchase_last_view_asof: the as-of join expressed as
  last_value(IGNORE NULLS) over an event-time window — one shuffle on
  user_id, no self-join blowup (the classic scalable as-of shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import QuerySpec


def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-stage funnel: users who viewed; then clicked after first
    view; then purchased after first qualifying click. One summary row."""
    ev = load(spark, sf_dir, "events")
    viewed = (
        ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("_vt"))
    )
    clicked = (
        ev.filter(F.col("event_type") == "click")
        .join(viewed, "user_id")
        .filter(F.col("ts") > F.col("_vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("_ct"))
    )
    purchased = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicked, "user_id")
        .filter(F.col("ts") > F.col("_ct"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("_pt"))
    )
    return (
        viewed.agg(F.count(F.lit(1)).alias("viewed_users"))
        .crossJoin(clicked.agg(F.count(F.lit(1)).alias("clicked_users")))
        .crossJoin(purchased.agg(F.count(F.lit(1)).alias("purchased_users")))
    )


def price_band_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (range) join: parts bucketed into literal price bands via
    a non-equi condition — plans as broadcast nested loop."""
    bands = spark.createDataFrame(
        [("budget", 0.0, 500.0), ("mid", 500.0, 1200.0), ("premium", 1200.0, 1e9)],
        ["band", "lo", "hi"],
    )
    part = load(spark, sf_dir, "part")
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("part_cnt"),
            F.max("p_retailprice").alias("max_price"),
        )
    )


def purchase_last_view_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the most recent prior view by the
    same user — last_value(IGNORE NULLS) over event-time order instead
    of a self-join (bounded state, one shuffle)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type").isin("view", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior_view = F.last(
        F.when(F.col("event_type") == "view", F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("last_view_ts", prior_view)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_event_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "last_view_ts",
        )
    )


def conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution (r13 queue): per user, the latency
    from FIRST view to FIRST subsequent purchase, then exact integer-rank
    quantiles (p25/50/75/90/99) of that latency across converting users
    — the number a growth team reads next to the funnel counts.

    Latency is in MICROSECONDS via unix_micros (exact integers on both
    engines; a seconds cast would truncate differently than DuckDB's
    fractional epoch).  Quantile ranks follow the length_quantiles
    discipline: 1-based rank (p·n+99) div 100 over (latency, user_id)
    order — no float index, no interpolation.  The converting-user
    frame is one agg over one scan; the final quantile window sorts
    only converting users (≪ events; at true scale the serving twin is
    percentile_approx, the length_quantiles_approx precedent)."""
    ev = load(spark, sf_dir, "events")
    firsts = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("_v"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("_p"),
        )
    )
    conv = firsts.filter(
        F.col("_v").isNotNull() & F.col("_p").isNotNull() & (F.col("_p") > F.col("_v"))
    ).select(
        "user_id",
        (F.unix_micros("_p") - F.unix_micros("_v")).alias("_lat"),
    )
    w = Window.orderBy("_lat", "user_id")
    ranked = conv.select(
        "_lat",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("_n"),
    )
    aggs = [F.max("_n").alias("n_users")]
    for p in (25, 50, 75, 90, 99):
        aggs.append(
            F.max(
                F.when(
                    F.col("_rn") == F.expr(f"(cast({p} as bigint) * _n + 99) div 100"),
                    F.col("_lat"),
                )
            ).alias(f"p{p}_us")
        )
    return ranked.agg(*aggs)


def user_inter_event_gap_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-user inter-event gaps (r14 queue) — THE
    input to choosing a sessionization timeout: the session gap
    (operators/sessions.py uses 30 min) should sit in the long tail of
    this distribution, and this query shows where the tail starts.

    Shape: one lag window per user (parallel across users — partitions
    bounded by per-user history), gaps in exact microseconds, then the
    integer-rank quantile fold over all gaps (the length_quantiles
    discipline; serving twin percentile_approx).  Tie-break on
    (user_id, event_id) so simultaneous events order identically in
    both engines."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "user_id",
            "event_id",
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("_gap"),
        )
        .filter(F.col("_gap").isNotNull())
    )
    wq = Window.orderBy("_gap", "user_id", "event_id")
    ranked = gaps.select(
        "_gap",
        F.row_number().over(wq).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("_n"),
    )
    aggs = [F.max("_n").alias("n_gaps")]
    for p in (50, 75, 90, 99):
        aggs.append(
            F.max(
                F.when(
                    F.col("_rn") == F.expr(f"(cast({p} as bigint) * _n + 99) div 100"),
                    F.col("_gap"),
                )
            ).alias(f"p{p}_us")
        )
    return ranked.agg(*aggs)


SPECS = [
    QuerySpec(
        "conversion_funnel",
        conversion_funnel,
        """
        WITH v AS (
            SELECT user_id, min(ts) AS vt FROM events WHERE event_type = 'view' GROUP BY 1
        ), c AS (
            SELECT e.user_id, min(e.ts) AS ct
            FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.vt
            WHERE e.event_type = 'click' GROUP BY 1
        ), p AS (
            SELECT e.user_id, min(e.ts) AS pt
            FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.ct
            WHERE e.event_type = 'purchase' GROUP BY 1
        )
        SELECT (SELECT count(*) FROM v) AS viewed_users,
               (SELECT count(*) FROM c) AS clicked_users,
               (SELECT count(*) FROM p) AS purchased_users
        """,
    ),
    QuerySpec(
        "price_band_counts",
        price_band_counts,
        """
        SELECT band, count(*) AS part_cnt, max(p_retailprice) AS max_price
        FROM part
        JOIN (VALUES ('budget', 0.0, 500.0),
                     ('mid', 500.0, 1200.0),
                     ('premium', 1200.0, 1e9)) bands(band, lo, hi)
          ON p_retailprice >= lo AND p_retailprice < hi
        GROUP BY band
        """,
    ),
    QuerySpec(
        "conversion_latency_quantiles",
        conversion_latency_quantiles,
        """
        WITH f AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN ts END) AS _v,
                   min(CASE WHEN event_type = 'purchase' THEN ts END) AS _p
            FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1
        ), conv AS (
            SELECT user_id, epoch_us(_p) - epoch_us(_v) AS _lat
            FROM f WHERE _v IS NOT NULL AND _p IS NOT NULL AND _p > _v
        ), r AS (
            SELECT _lat,
                   row_number() OVER (ORDER BY _lat, user_id) AS _rn,
                   count(*) OVER () AS _n
            FROM conv
        )
        SELECT CAST(max(_n) AS BIGINT) AS n_users,
               CAST(max(CASE WHEN _rn = (25 * _n + 99) // 100 THEN _lat END) AS BIGINT) AS p25_us,
               CAST(max(CASE WHEN _rn = (50 * _n + 99) // 100 THEN _lat END) AS BIGINT) AS p50_us,
               CAST(max(CASE WHEN _rn = (75 * _n + 99) // 100 THEN _lat END) AS BIGINT) AS p75_us,
               CAST(max(CASE WHEN _rn = (90 * _n + 99) // 100 THEN _lat END) AS BIGINT) AS p90_us,
               CAST(max(CASE WHEN _rn = (99 * _n + 99) // 100 THEN _lat END) AS BIGINT) AS p99_us
        FROM r
        """,
        "first-view→first-purchase latency quantiles (r13 queue)",
    ),
    QuerySpec(
        "user_inter_event_gap_quantiles",
        user_inter_event_gap_quantiles,
        """
        WITH g AS (
            SELECT user_id, event_id,
                   epoch_us(ts) - epoch_us(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)) AS _gap
            FROM events
        ), r AS (
            SELECT _gap,
                   row_number() OVER (ORDER BY _gap, user_id, event_id) AS _rn,
                   count(*) OVER () AS _n
            FROM g WHERE _gap IS NOT NULL
        )
        SELECT CAST(max(_n) AS BIGINT) AS n_gaps,
               CAST(max(CASE WHEN _rn = (50 * _n + 99) // 100 THEN _gap END) AS BIGINT) AS p50_us,
               CAST(max(CASE WHEN _rn = (75 * _n + 99) // 100 THEN _gap END) AS BIGINT) AS p75_us,
               CAST(max(CASE WHEN _rn = (90 * _n + 99) // 100 THEN _gap END) AS BIGINT) AS p90_us,
               CAST(max(CASE WHEN _rn = (99 * _n + 99) // 100 THEN _gap END) AS BIGINT) AS p99_us
        FROM r
        """,
        "per-user inter-event gap quantiles — the sessionization-timeout input (r14 queue)",
    ),
    QuerySpec(
        "purchase_last_view_asof",
        purchase_last_view_asof,
        """
        WITH vp AS (
            SELECT event_id, user_id, ts, event_type,
                   last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_ts
            FROM events WHERE event_type IN ('view', 'purchase')
        )
        SELECT event_id AS purchase_event_id, user_id, ts AS purchase_ts, last_view_ts
        FROM vp WHERE event_type = 'purchase'
        """,
    ),
]
