"""Synthetic clickstream generation — the engine-side twin of the
reference's ClickstreamGenerator (data_generator/clickstream_generator.py:29-99)
and its Kafka producer loop (kafka_produer/producer.py:78-118).

Two differences, both deliberate:
- Generation happens IN Spark (seeded ``F.rand``/hash expressions over
  a ``range``), not a Python loop: a billion-event fixture is a 1-line
  distributed job, and determinism comes from the seed, not wall time.
- The streaming twin is the ``rate`` source mapped through the same
  column expressions — events/sec is the rate source's knob, matching
  the reference's EVENTS_PER_SECOND (config.py:60).

Value domains follow the reference generator verbatim (pages
:16-20, event types :21-22, referrers :23-24, devices :25-27,
user_id 1-1000 :14, money ranges :81/:85)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES = [
    "/", "/products", "/products/category/electronics", "/products/category/clothing",
    "/products/category/home", "/products/item/123", "/products/item/456", "/cart",
    "/checkout", "/payment", "/confirmation", "/account", "/about", "/contact",
]
EVENT_TYPES = [
    "page_view", "button_click", "add_to_cart", "remove_from_cart", "checkout_progress",
    "purchase", "search", "login", "logout", "signup",
]
REFERRERS = [
    "https://google.com", "https://facebook.com", "https://twitter.com",
    "https://instagram.com", "direct", "email_campaign", "affiliate",
]
DEVICE_TYPES = ["desktop", "mobile", "tablet"]
BROWSERS = ["chrome", "firefox", "safari", "edge"]
OSES = ["windows", "macos", "ios", "android", "linux"]
SEARCH_QUERIES = ["laptop", "shoes", "phone", "dress", "headphones"]


def _pick(options: list[str], h: Column) -> Column:
    """Deterministic choice from a hash column."""
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(h, F.lit(len(options))) + 1).cast("int"))


def synthetic_clickstream(
    spark: SparkSession,
    n_events: int = 10000,
    n_users: int = 1000,
    seed: int = 42,
    start: str = "2024-01-01 00:00:00",
    events_per_second: float = 20.0,
) -> DataFrame:
    """Deterministic clickstream in the reference's full event schema
    (CLICKSTREAM_SCHEMA fields), distributed via ``spark.range``."""
    base = spark.range(n_events).withColumnRenamed("id", "_i")
    h = lambda s: F.xxhash64(F.col("_i"), F.lit(seed), F.lit(s))  # noqa: E731
    uid = (F.pmod(h("user"), F.lit(n_users)) + 1).cast("int")
    etype = _pick(EVENT_TYPES, h("etype"))
    # poisson-like arrivals without a global running sum (a window over
    # the whole range would serialize the generator): event i lands at
    # i/rate plus hash jitter — same mean rate, fully parallel
    u = (F.pmod(h("gap"), F.lit(1_000_000)) + 0.5) / 1_000_000.0
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(start))
        + F.col("_i") / F.lit(events_per_second)
        + (u - 0.5) / F.lit(events_per_second)
    )
    is_search = etype == "search"
    is_cart = etype == "add_to_cart"
    is_purchase = etype == "purchase"
    return base.select(
        uid.alias("user_id"),
        F.concat(F.lit("sess-"), uid, F.lit("-"), F.floor(F.col("_i") / 50)).alias("session_id"),
        ts.alias("timestamp"),
        _pick(PAGES, h("page")).alias("page"),
        etype.alias("event_type"),
        _pick(REFERRERS, h("ref")).alias("referrer"),
        F.struct(
            _pick(DEVICE_TYPES, h("dev")).alias("type"),
            _pick(BROWSERS, h("br")).alias("browser"),
            _pick(OSES, h("os")).alias("os"),
        ).alias("device"),
        F.concat_ws(
            ".", F.lit("192"), F.lit("168"),
            F.pmod(h("ip1"), F.lit(255)) + 1, F.pmod(h("ip2"), F.lit(255)) + 1,
        ).alias("ip_address"),
        F.concat(F.lit("Mozilla/5.0 Browser/"), F.pmod(h("ua"), F.lit(31)) + 80).alias("user_agent"),
        F.when(is_search, _pick(SEARCH_QUERIES, h("q"))).alias("search_query"),
        F.when(is_cart, (F.pmod(h("pid"), F.lit(1000)) + 1).cast("int")).alias("product_id"),
        F.when(is_cart, F.round(9.99 + (F.pmod(h("pp"), F.lit(99000)) / 100.0), 2)).alias("product_price"),
        F.when(is_cart, (F.pmod(h("qty"), F.lit(5)) + 1).cast("int")).alias("quantity"),
        F.when(is_purchase, F.concat(F.lit("order-"), F.abs(h("oid")))).alias("order_id"),
        F.when(is_purchase, F.round(19.99 + (F.pmod(h("ta"), F.lit(198000)) / 100.0), 2)).alias("total_amount"),
    )


def clickstream_rate_stream(
    spark: SparkSession, events_per_second: int = 20, seed: int = 42, n_users: int = 1000
) -> DataFrame:
    """Unbounded streaming twin on the ``rate`` source — the engine's
    stand-in for the reference's producer loop when no Kafka broker is
    around.  Same columns as synthetic_clickstream."""
    base = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(events_per_second))
        .load()
        .withColumnRenamed("value", "_i")
    )
    h = lambda s: F.xxhash64(F.col("_i"), F.lit(seed), F.lit(s))  # noqa: E731
    uid = (F.pmod(h("user"), F.lit(n_users)) + 1).cast("int")
    etype = _pick(EVENT_TYPES, h("etype"))
    return base.select(
        F.col("_i").alias("event_seq"),
        uid.alias("user_id"),
        F.concat(F.lit("sess-"), uid, F.lit("-"), F.floor(F.col("_i") / 50)).alias("session_id"),
        F.col("timestamp"),
        _pick(PAGES, h("page")).alias("page"),
        etype.alias("event_type"),
        _pick(REFERRERS, h("ref")).alias("referrer"),
        F.struct(
            _pick(DEVICE_TYPES, h("dev")).alias("type"),
            _pick(BROWSERS, h("br")).alias("browser"),
            _pick(OSES, h("os")).alias("os"),
        ).alias("device"),
        F.when(etype == "purchase", F.round(19.99 + (F.pmod(h("ta"), F.lit(198000)) / 100.0), 2)).alias("total_amount"),
    )
