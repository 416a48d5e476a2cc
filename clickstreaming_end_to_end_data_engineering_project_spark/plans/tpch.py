"""General-SQL capability extensions (SURVEY.md §2.11) over the
TPC-H-ish testdata: joins (broadcast / semi / anti), sorts + top-k,
analytic windows, rollup/cube, set ops, scalar date functions.

The reference's read surface is arbitrary SQL against Postgres
(storage/postgres_connector.py:44-55); these queries define the
engine-side equivalent surface, Catalyst-optimized.

Scale notes per query in the docstrings — the driving rules:
- dimension tables (region/nation/supplier/customer at these ratios)
  are broadcast; only lineitem⋈orders shuffles, on the join key.
- top-k is orderBy+limit → TakeOrderedAndProject (per-partition heap,
  no global sort).
- money aggregates accumulate in exact DECIMAL and convert to double
  once (order-independent → identical to the DuckDB oracle bit-for-bit;
  see functions.__init__ docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import money, one_minus, one_plus, sum_money
from ..sources.tables import load
from .registry import QuerySpec

# exact decimal revenue term: extprice * (1 - discount)
_REV = lambda: money("l_extendedprice") * one_minus("l_discount")  # noqa: E731
_REV_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))"
_SUM_REV_SQL = f"CAST(sum({_REV_SQL}) AS DOUBLE)"
_SUM_PRICE_SQL = "CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide multi-aggregate scan of lineitem.  One
    shuffle on (returnflag, linestatus) — 6 groups — after map-side
    partial agg; the shipdate filter pushes into the parquet scan."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    disc_price = _REV()
    charge = disc_price * one_plus("l_tax")
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(money("l_quantity")).cast("double").alias("sum_qty"),
            sum_money("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(money("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(money("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(money("l_discount")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: customer(broadcast) ⋈ orders ⋈ lineitem, revenue
    per order, top-10.  customer is the small side → broadcast hash
    join; lineitem⋈orders is the one real shuffle; top-10 is a
    TakeOrderedAndProject on exact doubles (deterministic ties via
    orderkey)."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1996-01-01"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_REV()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; all dims broadcast, lineitem⋈orders
    shuffles once.  Catalyst reorders the dim joins; AQE re-plans if a
    runtime side turns out smaller."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), (orders.o_custkey == cust.c_custkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_REV()).cast("double").alias("revenue"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer for
    one quarter — lineitem(returnflag=R)⋈orders shuffles once, customer
    and nation broadcast, top-20 as TakeOrderedAndProject."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_REV()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation (CASE inside SUM) over
    lineitem⋈part for one ship month; part broadcasts.  Both sums
    accumulate exact decimals; the percentage is one double division at
    the end (bit-identical to the oracle)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01")) & (F.col("l_shipdate") < F.lit("1997-10-01"))
    )
    part = load(spark, sf_dir, "part")
    rev = _REV()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev)).alias("_promo"),
            F.sum(rev).alias("_total"),
        )
        .select(
            (F.lit(100.0) * F.col("_promo").cast("double") / F.col("_total").cast("double")).alias(
                "promo_revenue_pct"
            )
        )
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate subquery (orders with
    > 300 total quantity) driving the join — the aggregate runs FIRST
    and shrinks the join input to the rare heavy orders; customer
    broadcasts; top-20 as TakeOrderedAndProject."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(money("l_quantity")).cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300.0)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: two-way CASE-sum classification — per lineitem
    status (standing in for the absent l_shipmode), how many 1997-
    shipped lines belong to critical (1-URGENT/2-HIGH) vs other
    orders.  One lineitem⋈orders shuffle; the two conditional sums are
    a single pass with map-side partials."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load(spark, sf_dir, "orders")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a DISJUNCTION of brand/size/
    quantity predicate bundles (adapted to this schema's columns).
    The p_partkey equi-join is shared across the OR arms so Catalyst
    keeps ONE broadcast hash join and evaluates the disjunction as a
    post-join filter; the per-arm part predicates stay pushable into
    the part scan as an OR-of-ANDs."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    arm1 = (F.col("p_brand") == "Brand#11") & (F.col("p_size") <= 15) & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    arm2 = (F.col("p_brand") == "Brand#22") & (F.col("p_size") <= 25) & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 40)
    arm3 = (F.col("p_brand") == "Brand#33") & (F.col("p_size") <= 35) & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 50)
    return j.filter(arm1 | arm2 | arm3).agg(
        F.sum(_REV()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between DISTINCT nation pairs for
    one ship year — the self-joined dimension pattern (nation enters
    the plan twice, as the supplier's n1 and the customer's n2, both
    broadcast under independent aliases).  lineitem⋈orders is the one
    real shuffle; supplier/customer/nation×2 all broadcast; the
    (supp_nation, cust_nation, year) agg is a handful of groups with
    map-side partials."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(F.sum(_REV()).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


def top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number window — partitioned by brand, so
    the window shuffle is on a low-skew key; no global sort."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum(_REV()).cast("double").alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("revenue").desc(), F.col("p_partkey"))
    return (
        rev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "revenue", "rn")
    )


def brand_best_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand arg-max via struct-max aggregation — a single hash agg
    (no window shuffle + filter like the row_number top-k path);
    deterministic ties through the struct's (revenue, partkey) order."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum(_REV()).cast("double").alias("revenue"))
    )
    best = rev.groupBy("p_brand").agg(
        F.max(F.struct("revenue", "p_partkey")).alias("_best")
    )
    return best.select(
        "p_brand",
        F.col("_best.p_partkey").alias("best_partkey"),
        F.col("_best.revenue").alias("best_revenue"),
    )


def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total via an unbounded window over the aggregate
    (25 rows — single-partition window is fine AFTER the reduce)."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    rev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(money("o_totalprice")).alias("_rev_dec"))
    )
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return rev.select(
        "n_name",
        F.col("_rev_dec").cast("double").alias("revenue"),
        (F.col("_rev_dec").cast("double") / F.sum("_rev_dec").over(w).cast("double")).alias(
            "revenue_share"
        ),
    )


def revenue_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP over the geo hierarchy (§2.11 grouping sets)."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        sum_money("o_totalprice").alias("total_spend"),
        F.count(F.lit(1)).alias("order_cnt"),
    )


def order_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE over (status, priority)."""
    orders = load(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_cnt"),
        sum_money("o_totalprice").alias("total_price"),
    )


def customers_active_both_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: custkeys ordering in both 1996 and 1997."""
    orders = load(spark, sf_dir, "orders")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("c_custkey"))
    y97 = orders.filter(F.year("o_orderdate") == 1997).select(F.col("o_custkey").alias("c_custkey"))
    return y96.intersect(y97)


def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS) — broadcast the probe side when small.
    Probed against URGENT-priority orders: the fixture has an order for
    every customer, so the unfiltered anti join is trivially empty —
    the priority filter makes the result non-trivial at every sf."""
    cust = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def customers_with_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS with predicate)."""
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def all_geo_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two name domains."""
    region = load(spark, sf_dir, "region").select(F.col("r_name").alias("name"))
    nation = load(spark, sf_dir, "nation").select(F.col("n_name").alias("name"))
    return region.union(nation).distinct()


def customers_never_big_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference) — the set-op twin of the
    `customers_with_big_orders` semi join: customers with NO order over
    $300k (every customer has SOME order in the fixture, so the
    unfiltered difference is trivially empty)."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    big_buyers = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000.0)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.subtract(big_buyers)


def customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join: every customer with their order count (0 kept)."""
    cust = load(spark, sf_dir, "customer")
    per_cust = (
        load(spark, sf_dir, "orders").groupBy(F.col("o_custkey")).agg(F.count(F.lit(1)).alias("_cnt"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce(F.col("_cnt"), F.lit(0)).alias("order_cnt"),
        )
    )


def nation_customer_supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates (customers vs suppliers per
    nation) — both null sides coalesced."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("_cnk"))
        .agg(F.count(F.lit(1)).alias("_cc"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("_snk"))
        .agg(F.count(F.lit(1)).alias("_sc"))
    )
    return c.join(s, c._cnk == s._snk, "full_outer").select(
        F.coalesce(F.col("_cnk"), F.col("_snk")).alias("nationkey"),
        F.coalesce(F.col("_cc"), F.lit(0)).alias("customers"),
        F.coalesce(F.col("_sc"), F.lit(0)).alias("suppliers"),
    )


def revenue_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc calendar aggregation (scalar date functions)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("order_month"))
        .agg(
            sum_money("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("order_cnt"),
        )
    )


def part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: split/lower/regexp over part type."""
    part = load(spark, sf_dir, "part")
    return (
        part.withColumn("type_head", F.lower(F.split(F.col("p_type"), " ").getItem(0)))
        .groupBy("type_head")
        .agg(
            F.count(F.lit(1)).alias("part_cnt"),
            (F.sum(money("p_retailprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.max("p_size").alias("max_size"),
        )
    )


def order_cumulative_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic frame spec: running monthly revenue via rowsBetween.
    The un-partitioned window is fine at scale: input is one row per
    month (≪ executor memory) after the aggregate."""
    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("order_month")).agg(
        F.sum(money("o_totalprice")).alias("_rev_dec")
    )
    w = Window.orderBy("order_month").rowsBetween(Window.unboundedPreceding, 0)
    # the running sum stays DECIMAL (exact) and converts to double once —
    # double-accumulation order in window sums differs across engines
    return monthly.select(
        "order_month",
        F.col("_rev_dec").cast("double").alias("revenue"),
        F.sum("_rev_dec").over(w).cast("double").alias("cum_revenue"),
    )


SPECS = [
    QuerySpec(
        "q1_pricing_summary",
        q1_pricing_summary,
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)      AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum({_REV_SQL}) AS DOUBLE)                             AS sum_disc_price,
               CAST(sum({_REV_SQL} * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*)      AS avg_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
               CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / count(*)      AS avg_disc,
               count(*)                                                    AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """,
    ),
    QuerySpec(
        "q10_returned_items",
        q10_returned_items,
        f"""
        SELECT c_custkey, c_name, n_name, {_SUM_REV_SQL} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
        """,
    ),
    QuerySpec(
        "q14_promo_revenue",
        q14_promo_revenue,
        f"""
        SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} END) AS DOUBLE)
                     / CAST(sum({_REV_SQL}) AS DOUBLE) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate <  TIMESTAMP '1997-10-01'
        """,
    ),
    QuerySpec(
        "q7_nation_pair_volume",
        q7_nation_pair_volume,
        f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               {_SUM_REV_SQL} AS revenue, count(*) AS n_lines
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND n1.n_name <> n2.n_name
        GROUP BY supp_nation, cust_nation
        """,
        "TPC-H Q7 shape: self-joined dimension (nation twice), nation-pair volume",
    ),
    QuerySpec(
        "q12_priority_by_linestatus",
        q12_priority_by_linestatus,
        """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_linestatus
        """,
        "TPC-H Q12 shape: two-way CASE-sum classification",
    ),
    QuerySpec(
        "q19_disjunctive_revenue",
        q19_disjunctive_revenue,
        f"""
        SELECT {_SUM_REV_SQL} AS revenue, count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#11' AND p_size <= 15 AND l_quantity BETWEEN 1 AND 30)
           OR (p_brand = 'Brand#22' AND p_size <= 25 AND l_quantity BETWEEN 10 AND 40)
           OR (p_brand = 'Brand#33' AND p_size <= 35 AND l_quantity BETWEEN 20 AND 50)
        """,
        "TPC-H Q19 shape: disjunctive predicate bundles over one join",
    ),
    QuerySpec(
        "q18_large_volume_customers",
        q18_large_volume_customers,
        """
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        HAVING CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 300.0
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
        """,
    ),
    QuerySpec(
        "q3_shipping_priority",
        q3_shipping_priority,
        f"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               {_SUM_REV_SQL} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate  > TIMESTAMP '1996-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
        """,
    ),
    QuerySpec(
        "q5_local_supplier_volume",
        q5_local_supplier_volume,
        f"""
        SELECT n_name, {_SUM_REV_SQL} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name
        """,
    ),
    QuerySpec(
        "top3_parts_per_brand",
        top3_parts_per_brand,
        f"""
        SELECT p_brand, p_partkey, revenue, rn FROM (
            SELECT p_brand, p_partkey,
                   {_SUM_REV_SQL} AS revenue,
                   row_number() OVER (
                       PARTITION BY p_brand
                       ORDER BY {_SUM_REV_SQL} DESC, p_partkey
                   ) AS rn
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand, p_partkey
        ) WHERE rn <= 3
        """,
    ),
    QuerySpec(
        "brand_best_part",
        brand_best_part,
        f"""
        WITH rev AS (
            SELECT p_brand, p_partkey, {_SUM_REV_SQL} AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand, p_partkey
        ), best AS (
            SELECT p_brand, max(row(revenue, p_partkey)) AS b FROM rev GROUP BY p_brand
        )
        SELECT p_brand, b[2] AS best_partkey, b[1] AS best_revenue FROM best
        """,
    ),
    QuerySpec(
        "nation_revenue_share",
        nation_revenue_share,
        """
        WITH rev AS (
            SELECT n_name, sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_dec
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            GROUP BY n_name
        )
        SELECT n_name,
               CAST(rev_dec AS DOUBLE) AS revenue,
               CAST(rev_dec AS DOUBLE) / CAST(sum(rev_dec) OVER
                   (ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE)
                   AS revenue_share
        FROM rev
        """,
    ),
    QuerySpec(
        "revenue_rollup_region_nation",
        revenue_rollup_region_nation,
        f"""
        SELECT r_name, n_name,
               {_SUM_PRICE_SQL} AS total_spend,
               count(*)         AS order_cnt
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        """,
    ),
    QuerySpec(
        "order_priority_cube",
        order_priority_cube,
        f"""
        SELECT o_orderstatus, o_orderpriority,
               count(*)         AS order_cnt,
               {_SUM_PRICE_SQL} AS total_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
    ),
    QuerySpec(
        "customers_active_both_years",
        customers_active_both_years,
        """
        SELECT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 1996
        INTERSECT
        SELECT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 1997
        """,
    ),
    QuerySpec(
        "customers_without_urgent_orders",
        customers_without_urgent_orders,
        """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
        """,
    ),
    QuerySpec(
        "customers_with_big_orders",
        customers_with_big_orders,
        """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_totalprice > 300000.0)
        """,
    ),
    QuerySpec(
        "all_geo_names",
        all_geo_names,
        """
        SELECT r_name AS name FROM region
        UNION
        SELECT n_name AS name FROM nation
        """,
    ),
    QuerySpec(
        "customers_never_big_purchase",
        customers_never_big_purchase,
        """
        SELECT c_custkey FROM customer
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000.0
        """,
    ),
    QuerySpec(
        "customer_order_counts",
        customer_order_counts,
        """
        SELECT c_custkey, c_mktsegment,
               COALESCE(cnt, 0) AS order_cnt
        FROM customer
        LEFT JOIN (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1) oc
               ON c_custkey = oc.o_custkey
        """,
    ),
    QuerySpec(
        "nation_customer_supplier_balance",
        nation_customer_supplier_balance,
        """
        WITH c AS (SELECT c_nationkey AS nk, count(*) AS cc FROM customer GROUP BY 1),
             s AS (SELECT s_nationkey AS nk, count(*) AS sc FROM supplier GROUP BY 1)
        SELECT COALESCE(c.nk, s.nk) AS nationkey,
               COALESCE(cc, 0) AS customers,
               COALESCE(sc, 0) AS suppliers
        FROM c FULL OUTER JOIN s ON c.nk = s.nk
        """,
    ),
    QuerySpec(
        "revenue_by_month",
        revenue_by_month,
        f"""
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
               {_SUM_PRICE_SQL} AS revenue,
               count(*)         AS order_cnt
        FROM orders GROUP BY 1
        """,
    ),
    QuerySpec(
        "part_type_stats",
        part_type_stats,
        """
        SELECT lower(str_split(p_type, ' ')[1]) AS type_head,
               count(*)                         AS part_cnt,
               CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
               max(p_size)                      AS max_size
        FROM part GROUP BY 1
        """,
    ),
    QuerySpec(
        "order_cumulative_revenue",
        order_cumulative_revenue,
        f"""
        WITH m AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
                   sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_dec
            FROM orders GROUP BY 1
        )
        SELECT order_month,
               CAST(rev_dec AS DOUBLE) AS revenue,
               CAST(sum(rev_dec) OVER (ORDER BY order_month
                     ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_revenue
        FROM m
        """,
    ),
]
