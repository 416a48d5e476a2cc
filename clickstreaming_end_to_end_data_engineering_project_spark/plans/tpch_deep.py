"""Deep decision-support shapes (TPC-H Q2/Q8/Q9/Q11/Q13/Q15/Q16/Q17/
Q20/Q21/Q22 adapted to the testdata schema) — the subquery-heavy tail
of the reference's raw-SQL read surface
(reference: storage/postgres_connector.py:44-55 accepts arbitrary SQL;
these define the engine-side equivalents, Catalyst-decorrelated).

The testdata lacks partsupp / ps_supplycost / l_shipmode /
l_commitdate / c_phone, so each query keeps the ORIGINAL PLAN SHAPE
(correlated min, market-share ratio, relative-threshold HAVING,
ON-clause-filtered outer join, scalar-max equality, distinct-agg with
NOT-IN exclusion, correlated avg, nested-IN chains, double-correlated
EXISTS/NOT EXISTS, scalar-avg + anti join) while substituting columns
that exist.  Every adaptation is stated in the docstring.

Exactness discipline (same as plans/tpch.py): money accumulates in
DECIMAL and casts to double once; correlated thresholds (min / max /
avg) are computed from exact decimal sums so both engines derive the
identical double and select the identical rows.

Scale notes: dimension tables broadcast; lineitem⋈orders is the one
real shuffle per query; every correlated subquery is expressed as a
window or a pre-aggregated join (never a per-row re-scan) so the plan
is shuffle-bounded, not O(rows × subquery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import money, one_minus
from ..sources.tables import load
from .registry import QuerySpec

_REV = lambda: money("l_extendedprice") * one_minus("l_discount")  # noqa: E731
_REV_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))"
_SUM_REV_SQL = f"CAST(sum({_REV_SQL}) AS DOUBLE)"


def _eu_suppliers(spark: SparkSession, sf_dir: str, region_name: str) -> DataFrame:
    """Suppliers restricted to one region via nation⋈region (both
    broadcast — dims)."""
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == region_name)
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )


def q2_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated-min subquery — for each large part
    (p_size >= 40), the EUROPE supplier whose average sale price equals
    the per-part minimum.  No partsupp table, so lineitem stands in as
    the part↔supplier cost relation (avg_price := exact decimal sum /
    count, one double division — both engines derive the identical
    double, so the min-equality selects identical rows).

    Plan: part + supplier-region dims broadcast; one shuffle on the
    (part, supplier) grouping; the correlated min decorrelates to a
    window-min over p_partkey (no re-scan per row); top-100 is
    TakeOrderedAndProject."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    eu = _eu_suppliers(spark, sf_dir, "EUROPE")
    cost = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(eu), li.l_suppkey == eu.s_suppkey)
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
        .agg(
            (F.sum(money("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias(
                "avg_price"
            )
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        cost.withColumn("_min_price", F.min("avg_price").over(w))
        .filter(F.col("avg_price") == F.col("_min_price"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "avg_price")
        .orderBy(F.col("s_acctbal").desc(), F.col("p_partkey"), F.col("s_suppkey"))
        .limit(100)
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — NATION_7's fraction of
    AMERICA-customer PROMO-part revenue, per order year.  The two-level
    conditional aggregate (CASE-sum over a 7-way join) with the nation
    dim entering twice (supplier side n1 for the share test, customer
    side n2 → region for the market scope).

    Plan: one lineitem⋈orders shuffle; part/supplier/customer/nation×2/
    region all broadcast; numerator and denominator accumulate exact
    decimals in one pass, one double division per year row."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_n2_key"), F.col("n_regionkey").alias("_n2_rk")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    rev = _REV()
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_n2_key"))
        .join(F.broadcast(region), F.col("_n2_rk") == region.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_7", rev)).alias("_nat"),
            F.sum(rev).alias("_all"),
        )
        .select(
            "o_year",
            (
                F.coalesce(F.col("_nat").cast("double"), F.lit(0.0))
                / F.col("_all").cast("double")
            ).alias("mkt_share"),
        )
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and order
    year for parts named like '%red%'.  No ps_supplycost, so profit is
    discounted revenue (the grouping/join shape — lineitem⋈orders plus
    three broadcast dims with a LIKE-filtered part scan — is the
    point).

    Plan: part filter pushes the contains() into the scan; one
    lineitem⋈orders shuffle; (nation, year) agg is a handful of groups
    with map-side partials."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(_REV()).cast("double").alias("profit"))
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value held by EUROPE suppliers, kept
    only when above a RELATIVE threshold (1.5× the mean per-part value —
    scale-invariant, unlike Q11's fixed fraction which must shrink with
    SF).  The scalar-subquery-threshold-over-the-same-aggregate shape.

    Plan: one shuffle on l_partkey for the per-part aggregate; the
    threshold comes from a 1-row aggregate of the SAME exact decimal
    sums (broadcast nested-loop join of one row — not a re-scan), so
    both engines compare the identical doubles."""
    li = load(spark, sf_dir, "lineitem")
    eu = _eu_suppliers(spark, sf_dir, "EUROPE")
    scoped = li.join(F.broadcast(eu), li.l_suppkey == eu.s_suppkey)
    per_part = scoped.groupBy("l_partkey").agg(F.sum(_REV()).alias("_vdec"))
    totals = per_part.agg(
        F.sum("_vdec").alias("_tdec"), F.count(F.lit(1)).alias("_nparts")
    )
    return (
        per_part.crossJoin(F.broadcast(totals))
        .filter(
            F.col("_vdec").cast("double")
            > F.lit(1.5) * F.col("_tdec").cast("double") / F.col("_nparts")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("_vdec").cast("double").alias("part_value"),
        )
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution with the
    filter INSIDE the outer-join condition (customers keep a 0 count
    when ALL their orders are urgent — a WHERE would drop them).  The
    double-aggregate: count per customer, then histogram of counts.

    Plan: one shuffle for the outer join on custkey (orders side is
    pre-projected to 2 columns), one tiny re-agg on the count value."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) whose 1997-Q1 revenue equals the
    maximum — the scalar-max-equality join (Q15's revenue view +
    max-subquery), kept EXACT by comparing the decimal sums themselves
    (ties select every maximal supplier, deterministically, in both
    engines; the double cast happens only in the output).

    Plan: one shuffle on l_suppkey; the max decorrelates to a 1-row
    aggregate broadcast back; supplier dim broadcast."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    srev = li.groupBy("l_suppkey").agg(F.sum(_REV()).alias("_rdec"))
    mx = srev.agg(F.max("_rdec").alias("_mx"))
    supp = load(spark, sf_dir, "supplier")
    return (
        srev.crossJoin(F.broadcast(mx))
        .filter(F.col("_rdec") == F.col("_mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", F.col("_rdec").cast("double").alias("total_rev"))
    )


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    bucket, EXCLUDING flagged suppliers via NOT IN (no comment field,
    so negative account balance stands in for '%Complaints%').

    Plan: the NOT IN decorrelates to a broadcast left-anti join on the
    tiny flagged-supplier list; part broadcast with the attribute
    filters pushed; countDistinct shuffles once on the 3-column group
    key (Spark expands distinct aggs to a two-phase plan)."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 14, 23, 45)
    )
    flagged = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(flagged), li.l_suppkey == flagged.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity lines of one brand —
    lines with quantity below half the part's average quantity (the
    correlated-avg subquery; 0.5 instead of 0.2 so every SF selects
    rows).  avg := exact decimal sum / count, identical double in both
    engines.

    Plan: part (brand-filtered) broadcasts; the correlated avg
    decorrelates to a window over l_partkey on the already-joined rows
    (the join restricts to exactly the subquery's lineitem set, since
    the filter is on part attributes only) — one shuffle, no re-scan."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    w = Window.partitionBy("l_partkey")
    avg_qty = F.sum(money("l_quantity")).over(w).cast("double") / F.count(F.lit(1)).over(w)
    return (
        j.withColumn("_avg_qty", avg_qty)
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("_avg_qty"))
        .agg(
            (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q20_promotable_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved real volume of 'red' parts
    in 1997 — the nested-IN chain (part name → lineitem volume HAVING →
    supplier), each level decorrelating to a semi join.  No
    ps_availqty, so the volume test is an absolute threshold on the
    exact decimal quantity sum (> 50, i.e. more than one max-size line).

    Plan: red-part filter pushes into the part scan and broadcasts as a
    semi join into lineitem; the (supplier, part) agg shuffles once;
    the final supplier lookup is a broadcast semi join."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    red = load(spark, sf_dir, "part").filter(F.col("p_name").startswith("red")).select(
        "p_partkey"
    )
    movers = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(money("l_quantity")).alias("_qdec"))
        .filter(F.col("_qdec").cast("double") > 50.0)
        .select("l_suppkey")
        .distinct()
    )
    supp = load(spark, sf_dir, "supplier")
    return supp.join(
        F.broadcast(movers), supp.s_suppkey == movers.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


def q21_late_sole_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone shipped late on
    multi-supplier orders — the double-correlated EXISTS (another
    supplier on the order) + NOT EXISTS (another LATE supplier).  No
    l_commitdate/l_receiptdate, so 'late' is shipping >60 days after
    the order date.

    Plan: instead of two correlated re-scans of lineitem, TWO stacked
    hash aggregates over one lineitem⋈orders pass — first per
    (order, supplier) (did this supplier ship late? how many late
    lines?), then per order (supplier count, late-supplier count, the
    sole late supplier, its late-line total).  Deliberately NOT a
    single groupBy with two countDistincts: that plans an Expand that
    triples the shuffled row count, where the stacked form's first agg
    combines map-side and re-shuffles nothing (both aggs share the
    l_orderkey-prefixed key).  Orders with >1 supplier and exactly 1
    late supplier attribute their late lines to that supplier —
    semantically identical to the EXISTS/NOT-EXISTS pair.  Top-20 is
    TakeOrderedAndProject with the deterministic (numwait desc,
    s_name) order."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order_supp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(late.cast("int")).alias("_any_late"),
            F.sum(late.cast("int")).alias("_late_lines_s"),
        )
    )
    per_order = (
        per_order_supp.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("_n_supp"),
            F.sum("_any_late").alias("_n_late_supp"),
            F.max(F.when(F.col("_any_late") == 1, F.col("l_suppkey"))).alias("_late_supp"),
            F.sum("_late_lines_s").alias("_late_lines"),
        )
        .filter((F.col("_n_supp") > 1) & (F.col("_n_late_supp") == 1))
    )
    supp = load(spark, sf_dir, "supplier")
    return (
        per_order.groupBy("_late_supp")
        .agg(F.sum("_late_lines").alias("numwait"))
        .join(F.broadcast(supp), F.col("_late_supp") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy-but-idle customers per nation — balance
    above the average POSITIVE balance of the scoped nations (scalar
    subquery) and no recent orders (anti join; the fixture gives every
    customer SOME order, so 'idle' means none since 2000 — the
    original's NOT-EXISTS-any-order would be trivially empty).  No
    c_phone, so the country-code IN-list becomes a nationkey IN-list.

    Plan: the scalar avg is a 1-row broadcast from exact decimal sums;
    the anti join broadcasts the date-filtered order keys at these
    ratios (at 100 TB it becomes a shuffle anti join on custkey — still
    one shuffle); final agg is a handful of nation groups."""
    nations = [0, 2, 4, 6, 8, 10, 12]
    cust = load(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nations))
    avg_pos = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("_avg_bal")
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(F.broadcast(recent), cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(money("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


SPECS = [
    QuerySpec(
        "q2_cheapest_supplier_per_part",
        q2_cheapest_supplier_per_part,
        """
        WITH cost AS (
            SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                       / count(*) AS avg_price
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE p_size >= 40 AND r_name = 'EUROPE'
            GROUP BY p_partkey, p_name, s_suppkey, s_name, s_acctbal
        )
        SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, avg_price
        FROM cost c1
        WHERE avg_price = (SELECT min(avg_price) FROM cost c2
                           WHERE c2.p_partkey = c1.p_partkey)
        ORDER BY s_acctbal DESC, p_partkey, s_suppkey
        LIMIT 100
        """,
        "TPC-H Q2 shape: correlated-min cheapest supplier per part",
    ),
    QuerySpec(
        "q8_market_share",
        q8_market_share,
        f"""
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               COALESCE(CAST(sum(CASE WHEN n1.n_name = 'NATION_7'
                                      THEN {_REV_SQL} END) AS DOUBLE), 0.0)
                   / CAST(sum({_REV_SQL}) AS DOUBLE) AS mkt_share
        FROM lineitem
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN part      ON l_partkey = p_partkey
        JOIN supplier  ON l_suppkey = s_suppkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region    ON n2.n_regionkey = r_regionkey
        WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
        GROUP BY o_year
        """,
        "TPC-H Q8 shape: national market share per order year",
    ),
    QuerySpec(
        "q9_product_profit",
        q9_product_profit,
        f"""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS o_year,
               {_SUM_REV_SQL} AS profit
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
        """,
        "TPC-H Q9 shape: product-line profit by nation and year",
    ),
    QuerySpec(
        "q11_important_parts",
        q11_important_parts,
        f"""
        WITH v AS (
            SELECT l_partkey AS p_partkey, sum({_REV_SQL}) AS vdec
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
            GROUP BY l_partkey
        )
        SELECT p_partkey, CAST(vdec AS DOUBLE) AS part_value
        FROM v
        WHERE CAST(vdec AS DOUBLE) >
              (SELECT 1.5 * CAST(sum(vdec) AS DOUBLE) / count(*) FROM v)
        """,
        "TPC-H Q11 shape: parts above a relative value threshold",
    ),
    QuerySpec(
        "q13_customer_distribution",
        q13_customer_distribution,
        """
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (
            SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
        """,
        "TPC-H Q13 shape: order-count distribution, filter inside outer-join ON",
    ),
    QuerySpec(
        "q15_top_supplier",
        q15_top_supplier,
        f"""
        WITH srev AS (
            SELECT l_suppkey, sum({_REV_SQL}) AS rdec
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(rdec AS DOUBLE) AS total_rev
        FROM supplier JOIN srev ON s_suppkey = l_suppkey
        WHERE rdec = (SELECT max(rdec) FROM srev)
        """,
        "TPC-H Q15 shape: scalar-max-equality top supplier",
    ),
    QuerySpec(
        "q16_part_supplier_counts",
        q16_part_supplier_counts,
        """
        SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          AND p_size IN (1, 14, 23, 45)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        """,
        "TPC-H Q16 shape: distinct-supplier counts with NOT-IN exclusion",
    ),
    QuerySpec(
        "q17_small_quantity_revenue",
        q17_small_quantity_revenue,
        """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
                   AS avg_yearly,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#3'
          AND l_quantity <
              (SELECT 0.5 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                             / count(*))
               FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        """,
        "TPC-H Q17 shape: correlated-avg small-quantity revenue",
    ),
    QuerySpec(
        "q20_promotable_part_suppliers",
        q20_promotable_part_suppliers,
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE 'red%')
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY l_suppkey, l_partkey
            HAVING CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 50.0
        )
        """,
        "TPC-H Q20 shape: nested-IN volume-qualified suppliers",
    ),
    QuerySpec(
        "q21_late_sole_suppliers",
        q21_late_sole_suppliers,
        """
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders      ON o_orderkey = l1.l_orderkey
        WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
        """,
        "TPC-H Q21 shape: sole-late-supplier double correlation",
    ),
    QuerySpec(
        "q22_idle_customers",
        q22_idle_customers,
        """
        SELECT c_nationkey AS nationkey,
               CAST(count(*) AS BIGINT) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_nationkey IN (0, 2, 4, 6, 8, 10, 12)
          AND c_acctbal >
              (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                      / count(*)
               FROM customer c2
               WHERE c2.c_acctbal > 0
                 AND c2.c_nationkey IN (0, 2, 4, 6, 8, 10, 12))
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_nationkey
        """,
        "TPC-H Q22 shape: wealthy idle customers per nation",
    ),
]
