"""Relational query surface over the fixture star schema (SURVEY.md §7.2 #6).

The reference has no relational layer; these queries exercise the Spark
operator categories its capabilities map onto (§2.3 joins, §2.4 aggregations,
§2.5 sorts/top-k, §2.6 set ops, §2.7 windows, §2.8 scalar functions) at the
fixture schema, each with a DuckDB oracle twin.

Scale discipline applied throughout:
- dimension joins (region/nation/customer/supplier/part) carry explicit
  ``F.broadcast`` hints — at 100 TB the fact tables shuffle, dimensions never;
- aggregates group BEFORE joining where semantics allow (q5 revenue);
- every ``orderBy+limit`` has a deterministic tie-break so top-k is stable
  (TakeOrderedAndProject, no global sort);
- float aggregates are rounded (2dp money sums, 6dp ratios) so value hashes
  are stable across engines' summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tf_idf_using_mapreduce_spark.functions.money import (
    REV_UNITS_DUCK as _REV_UNITS_DUCK,
    REV_SUM_2DP_SQL as _REV_SUM_2DP_SQL,
    SUM_CHARGE_2DP_SQL as _SUM_CHARGE_2DP_SQL,
    cents_sum_2dp as _cents_sum_2dp,
    cents_sum_2dp_sql as _cents_sum_2dp_sql,
    rev_sum_2dp as _rev_sum_2dp,
    sum_charge_2dp as _sum_charge_2dp,
)
from tf_idf_using_mapreduce_spark.sources.corpus import load_table

_CUTOFF = "1998-09-01"


# --------------------------------------------------------------------------- #
# q1: scan + filter + wide aggregation (TPC-H Q1 shape)
# --------------------------------------------------------------------------- #

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # money sums run in exact integer units (functions/money.py): base
    # price in cents, disc_price on its 1e-4 grid, charge on its 1e-6
    # grid (DECIMAL(38,0) sum) — no float accumulation order anywhere.
    # sum_qty stays a double sum: quantities are exact small integers,
    # whose double sum is exact to 2^53 (~9e15 — past 100 TB row counts
    # times max quantity).
    return (
        li.where(F.col("l_shipdate") <= F.lit(_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            _cents_sum_2dp("l_extendedprice").alias("sum_base_price"),
            _rev_sum_2dp().alias("sum_disc_price"),
            _sum_charge_2dp().alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       {_cents_sum_2dp_sql('l_extendedprice')} AS sum_base_price,
       {_REV_SUM_2DP_SQL} AS sum_disc_price,
       {_SUM_CHARGE_2DP_SQL} AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------- #
# q3: broadcast dim join + agg + top-k (TPC-H Q3 shape)
# --------------------------------------------------------------------------- #

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_rev_sum_2dp().alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_ORACLE = f"""
SELECT l_orderkey, o_orderdate,
       {_REV_SUM_2DP_SQL} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------- #
# q5: multi-way join through the dimension chain (TPC-H Q5 shape)
# --------------------------------------------------------------------------- #

def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(_rev_sum_2dp().alias("revenue"))
    )


Q5_ORACLE = f"""
SELECT r_name, n_name,
       {_REV_SUM_2DP_SQL} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# --------------------------------------------------------------------------- #
# top-k with deterministic ties (T1 generalization)
# --------------------------------------------------------------------------- #

def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


TOPK_ORDERS_ORACLE = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
"""


# --------------------------------------------------------------------------- #
# rollup / cube (grouping sets; absent in the reference, §2.4)
# --------------------------------------------------------------------------- #

def rollup_customer_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    aggs = [
        F.count(F.lit(1)).alias("n_customers"),
        _cents_sum_2dp("c_acctbal").alias("total_acctbal"),
    ]
    # SQL standard: the rollup's () grouping set yields the grand-total row
    # even over EMPTY input (DuckDB conforms; Spark's rollup returns zero
    # rows — found by tools/degenerate_check.py). The driver-side probe is a
    # limit-1 scan (first row group at any scale); the non-empty plan — one
    # Expand + one shuffle — is untouched, which a union-with-global-agg
    # form (a second full scan) would not be.
    if joined.isEmpty():
        return joined.agg(*aggs).select(
            F.lit("ALL").alias("r_name"), F.lit("ALL").alias("n_name"),
            "n_customers", "total_acctbal",
        )
    return (
        joined.rollup("r_name", "n_name")
        .agg(*aggs)
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
            "n_customers",
            "total_acctbal",
        )
    )


ROLLUP_ORACLE = f"""
SELECT coalesce(r_name, 'ALL') AS r_name,
       coalesce(n_name, 'ALL') AS n_name,
       count(*) AS n_customers,
       {_cents_sum_2dp_sql('c_acctbal')} AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n")]
    # empty-input grand-total row, same standard-conformance probe as
    # rollup_customer_geo (see the comment there)
    if li.isEmpty():
        return li.agg(*aggs).select(
            F.lit("ALL").alias("l_returnflag"), F.lit("ALL").alias("l_linestatus"),
            "sum_qty", "n",
        )
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(*aggs)
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "sum_qty",
            "n",
        )
    )


CUBE_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------- #
# window functions (§2.7 — strict generalization of T1)
# --------------------------------------------------------------------------- #

def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "rk")
    )


TOP3_PER_CUSTOMER_ORACLE = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rk
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      FROM orders) ranked
WHERE rk <= 3
"""


def running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


RUNNING_SPEND_ORACLE = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
FROM orders
"""


# --------------------------------------------------------------------------- #
# semi/anti joins + set operations (§2.3 J2, §2.6)
# --------------------------------------------------------------------------- #

def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


CUSTOMERS_WITHOUT_ORDERS_ORACLE = """
-- NOT EXISTS, not NOT IN: NOT IN returns zero rows if o_custkey ever holds a
-- NULL, whereas Spark's left_anti keeps all unmatched customers.
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def order_status_symmetric_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with 'F' orders XOR 'O' orders — except + union exercise."""
    orders = load_table(spark, sf_dir, "orders")
    f_cust = orders.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey")).distinct()
    o_cust = orders.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey")).distinct()
    return f_cust.exceptAll(o_cust).union(o_cust.exceptAll(f_cust)).distinct()


SYMMETRIC_DIFF_ORACLE = """
WITH f AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'),
     o AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O')
SELECT custkey FROM ((SELECT custkey FROM f EXCEPT SELECT custkey FROM o)
                     UNION
                     (SELECT custkey FROM o EXCEPT SELECT custkey FROM f)) sd
"""


def suppliers_intersect_customer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations having both suppliers and customers — intersect exercise."""
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    return supp.intersect(cust)


NATION_INTERSECT_ORACLE = """
SELECT s_nationkey AS nationkey FROM supplier
INTERSECT
SELECT c_nationkey AS nationkey FROM customer
"""


def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipped revenue between two fixed nations by year (fixture names NATION_20/NATION_11) —
    double dimension chain + date-range filter pushed to the scan."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(
            ((F.col("supp_nation") == "NATION_20") & (F.col("cust_nation") == "NATION_11"))
            | ((F.col("supp_nation") == "NATION_11") & (F.col("cust_nation") == "NATION_20"))
        )
    )
    return (
        pairs.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_rev_sum_2dp().alias("revenue"))
    )


Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST((sum(volume) + 50) // 100 AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         {_REV_UNITS_DUCK} AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
      OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
) shipping
GROUP BY 1, 2, 3
"""


def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join + two-level aggregation — the
    distribution of customers by order count (zero-order customers kept)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_ORACLE = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


# --------------------------------------------------------------------------- #
# subqueries (EXISTS / NOT EXISTS / scalar — Catalyst rewrites to joins)
# --------------------------------------------------------------------------- #

def orders_with_returns_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority distribution of orders having ≥1 returned
    line (correlated EXISTS → Catalyst plans a left-semi join)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql("""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders_v
        WHERE EXISTS (SELECT 1 FROM lineitem_v
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
    """)


EXISTS_ORACLE = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def customers_above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: customers whose balance exceeds the global average
    (Catalyst: single-row subquery → broadcast)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql("""
        SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal
        FROM customer_v
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_v)
    """)


SCALAR_SUBQUERY_ORACLE = """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
"""


def parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS (anti-join rewrite)."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql("""
        SELECT p_partkey, p_name FROM part_v
        WHERE NOT EXISTS (SELECT 1 FROM lineitem_v WHERE l_partkey = p_partkey)
    """)


NOT_EXISTS_ORACLE = """
SELECT p_partkey, p_name FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
"""


# --------------------------------------------------------------------------- #
# pivot
# --------------------------------------------------------------------------- #

_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type counts pivoted to columns (explicit value list —
    at scale an open-ended pivot needs a values pass first; pinning the list
    keeps the plan a single aggregation)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(_EVENT_TYPES))
    )


PIVOT_ORACLE = f"""
SELECT user_id,
       {", ".join(f"count(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in _EVENT_TYPES)}
FROM events GROUP BY user_id
"""


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS through the engine's ``spark.sql`` surface (SURVEY.md
    §3.4 entry point 2): revenue by (status), by (priority), and overall —
    sets rollup/cube can't express."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_v")
    # the exact-cents sum text is dialect-portable (CAST/BIGINT/DOUBLE parse
    # identically in Spark SQL and DuckDB), so both engines share it verbatim.
    # Empty-input probe: the () grouping set's grand-total row survives an
    # empty table per the SQL standard (see rollup_customer_geo).
    if orders.isEmpty():
        return spark.sql(f"""
            SELECT 'ALL' AS status, 'ALL' AS priority,
                   {_cents_sum_2dp_sql('o_totalprice')} AS revenue,
                   count(*) AS n
            FROM orders_v
        """)
    return spark.sql(f"""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               {_cents_sum_2dp_sql('o_totalprice')} AS revenue,
               count(*) AS n
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


GROUPING_SETS_ORACLE = f"""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       {_cents_sum_2dp_sql('o_totalprice')} AS revenue,
       count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --------------------------------------------------------------------------- #
# date + JSON scalar functions over events/orders (§2.8)
# --------------------------------------------------------------------------- #

def monthly_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            _cents_sum_2dp("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


MONTHLY_REVENUE_ORACLE = f"""
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       {_cents_sum_2dp_sql('o_totalprice')} AS revenue,
       count(*) AS n_orders
FROM orders GROUP BY 1
"""


def lineitem_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per return flag: exact interpolated quantiles,
    sample stddev, Pearson correlation — the §2.8 numeric-aggregate surface.
    Exact ``percentile`` sorts each group's values; fine for bounded group
    counts, and the sketch-based twin (:func:`lineitem_price_stats_approx`)
    is the 100 TB path."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE percentile aggregate with an array of targets (r15, guide §1.2
    # "per-task work"): three scalar percentile() calls each buffer and sort
    # the group's value multiset independently — the array form buffers and
    # sorts ONCE and interpolates all three targets from the same sorted run
    # (identical per-target interpolation, so values are unchanged; measured
    # 3.6 s → ~1.8 s at sf0.1)
    pcts = F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.95))")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        pcts.alias("_pcts"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
    ).select(
        "l_returnflag", "n",
        F.round(F.element_at("_pcts", 1), 4).alias("p25"),
        F.round(F.element_at("_pcts", 2), 4).alias("median"),
        F.round(F.element_at("_pcts", 3), 4).alias("p95"),
        "sd", "qty_price_corr",
    )


LINEITEM_PRICE_STATS_ORACLE = """
SELECT l_returnflag, count(*) AS n,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS median,
       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
       round(stddev_samp(l_extendedprice), 4) AS sd,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr
FROM lineitem GROUP BY l_returnflag
"""


def lineitem_price_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch twin of :func:`lineitem_price_stats`: ``approx_percentile``
    (GK sketch — mergeable partial state, no per-group sort/shuffle of raw
    values) is how quantiles survive 100 TB. Rows-only check (DuckDB's
    approx sketch differs); relative error vs exact asserted in tests."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.25, 1000)").alias("p25"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("median"),
        F.expr("approx_percentile(l_extendedprice, 0.95, 1000)").alias("p95"),
    )


# GK sketch at accuracy=1000 guarantees rank error ≤ 1/1000; the gate allows
# 10× slack so only a broken sketch (not boundary duplicates) trips it
GK_RANK_ERR_MAX = 0.01


def lineitem_price_stats_approx_err(spark: SparkSession, sf_dir: str,
                                    rank_err_max: float = GK_RANK_ERR_MAX) -> DataFrame:
    """(l_returnflag, n, n_violations): the ERROR-BOUND gate for
    :func:`lineitem_price_stats_approx`. The GK sketch's contract is on
    RANK, not value: each approx percentile must be an element whose rank in
    its group lies within ``rank_err_max`` of the target fraction. Per group
    we join the 3-row approx result back (broadcast) and count, for each
    target p, rows strictly below / at-or-below the sketch value — the
    value's rank interval — and flag a violation when that interval misses
    [p − ε, p + ε]. The oracle reproduces the group sizes exactly and pins
    ``n_violations = 0``."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    apx = lineitem_price_stats_approx(spark, sf_dir)
    # null-safe equality: a NULL l_returnflag is a legitimate GROUP on both
    # engines (DuckDB's GROUP BY keeps it); a plain equi-join would drop it
    # and the gate would silently skip the group (found by the --nulls sweep)
    j = li.join(
        F.broadcast(apx),
        li["l_returnflag"].eqNullSafe(apx["l_returnflag"]),
    ).drop(apx["l_returnflag"])

    def ranks(col: str):
        # count(when): NULL prices (and a NULL sketch value) compare to
        # NULL and must count in NEITHER side, not poison the sum
        lt = F.count(F.when(F.col("l_extendedprice") < F.col(col), True))
        le = F.count(F.when(F.col("l_extendedprice") <= F.col(col), True))
        return lt, le

    # rank-ratio denominator: the GK sketch's rank contract is over NON-NULL
    # values only, so the ratios must divide by count(l_extendedprice) — with
    # mixed NULL density (>~1% NULLs in a group) a count(*) denominator
    # deflates le/n below p − ε and reports phantom violations the oracle's
    # pinned 0 would flag (ADVICE r9). The OUTPUT column ``n`` stays
    # count(*) to match the oracle's group sizes.
    aggs = [F.count(F.lit(1)).alias("n"),
            F.count("l_extendedprice").alias("n_vals")]
    for col, p in (("p25", 0.25), ("median", 0.5), ("p95", 0.95)):
        lt, le = ranks(col)
        aggs += [lt.alias(f"lt_{col}"), le.alias(f"le_{col}"),
                 F.max(F.col(col).isNotNull()).alias(f"def_{col}")]
    stats = j.groupBy("l_returnflag").agg(*aggs)
    viol_terms = []
    for col, p in (("p25", 0.25), ("median", 0.5), ("p95", 0.95)):
        too_high = F.col(f"lt_{col}") / F.col("n_vals") > F.lit(p + rank_err_max)
        too_low = F.col(f"le_{col}") / F.col("n_vals") < F.lit(p - rank_err_max)
        # a group whose values are all NULL has no percentiles (the sketch
        # returns NULL) — no contract to violate
        viol_terms.append(
            F.when(F.col(f"def_{col}") & (too_high | too_low), 1).otherwise(0)
        )
    n_viol = viol_terms[0] + viol_terms[1] + viol_terms[2]
    return stats.select(
        "l_returnflag", "n", n_viol.cast("long").alias("n_violations")
    )


LINEITEM_PRICE_STATS_APPROX_ERR_ORACLE = """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(0 AS BIGINT) AS n_violations
FROM lineitem GROUP BY l_returnflag
"""




def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract the numeric ``k`` from the JSON ``props`` column and aggregate.

    Extraction is a portable regexp (both engines); Spark-side
    ``get_json_object`` is the idiomatic alternative but DuckDB's JSON
    extension is not loadable offline, so the shared expression keeps the
    oracle honest.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("cast(regexp_extract(props, '(-?[0-9]+)', 1) as bigint)")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.sum("k").alias("sum_k"),
        )
    )


EVENTS_JSON_ORACLE = """
SELECT event_type, count(*) AS n,
       round(avg(value), 6) AS avg_value,
       -- outer CAST: DuckDB's sum(BIGINT) is HUGEINT -> pandas float64 ->
       -- driver hash mismatch vs Spark's int64 (CORRECTNESS_r01 root cause)
       CAST(sum(cast(regexp_extract(props, '(-?[0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY event_type
"""


def events_json_schema_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same aggregate as :func:`events_json_stats` but extracting ``k``
    through ``from_json`` with an explicit schema — the idiomatic Spark JSON
    path (schema projection, JVM-side parsing, pushdown-friendly) rather
    than the portable regexp. The ORACLE stays the regexp form (DuckDB's
    JSON extension can't load offline): on this data the two extractions
    are semantically identical, which the driver's value hash now proves
    per round."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("j", F.from_json("props", "k bigint"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("j.k").alias("sum_k"),
            F.min("j.k").alias("min_k"),
            F.max("j.k").alias("max_k"),
        )
    )


EVENTS_JSON_SCHEMA_ORACLE = """
SELECT event_type, count(*) AS n,
       CAST(sum(cast(regexp_extract(props, '(-?[0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
       min(cast(regexp_extract(props, '(-?[0-9]+)', 1) AS BIGINT)) AS min_k,
       max(cast(regexp_extract(props, '(-?[0-9]+)', 1) AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


def user_event_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) of the pivoted per-user event counts back to long form
    — the STACK/(UNPIVOT) half of the reshape pair. Zero-count cells are
    dropped so the roundtrip equals the original long-form aggregate."""
    wide = user_event_pivot(spark, sf_dir)
    # the pivot uses an explicit value list (_EVENT_TYPES), so NULL event
    # types never materialize a column — select by membership in that list
    # rather than excluding names, so a future genuine type would round-trip
    # instead of being silently dropped (ADVICE r9); the oracle's
    # WHERE event_type IS NOT NULL gives parity for NULL types
    types = [c for c in wide.columns if c in _EVENT_TYPES]
    stack = ", ".join(f"'{t}', {t}" for t in types)
    return (
        wide.select(
            "user_id",
            F.expr(f"stack({len(types)}, {stack}) AS (event_type, n)"),
        )
        .where(F.col("n") > 0)
    )


UNPIVOT_ORACLE = """
SELECT user_id, event_type, count(*) AS n
FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
"""


def customer_order_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(custkey, orderkey, next_orderkey, gap_days, quartile): per-customer
    order cadence — ``lead`` for the follow-up order, day gap between
    consecutive orders, ``ntile(4)`` spend quartile per customer. Rounds out
    the window-function family (offset + distribution functions) beyond
    rank/frames."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.datediff(F.lead("o_orderdate").over(w), F.col("o_orderdate")).alias("gap_days"),
        F.ntile(4).over(
            Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        ).alias("quartile"),
    )


ORDER_CADENCE_ORACLE = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       lead(o_orderkey) OVER w AS next_orderkey,
       CAST(date_diff('day', o_orderdate, lead(o_orderdate) OVER w) AS INTEGER) AS gap_days,
       CAST(ntile(4) OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (batch twin of the streaming path —
    the same ``F.window`` call Structured Streaming uses)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def _user_segment_dim(ev: DataFrame) -> DataFrame:
    """(user_id, segment): the per-user dimension of the skew-join twins —
    'heavy' when the user's event count reaches 2× the per-user average
    (exact: integer counts averaged in double, both engines IEEE-identical),
    else 'light'. O(users) rows: a dimension, not a fact.

    MATERIALIZED (``localCheckpoint``), and that is load-bearing for the AQE
    twin: ``OptimizeSkewedJoin`` can only split a sort-merge join whose
    children are bare shuffle reads it can re-chunk/duplicate. Left in-plan,
    the dim side of the join is an Aggregate ABOVE its shuffle read (the
    groupBy's own partitioning feeds the join with no second exchange), the
    pattern doesn't match, and the hot fact partition never splits —
    measured, not theorized (round 12). Production reads the dimension from
    a table, which is the same leaf shape the checkpoint produces."""
    per = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_ev"))
    stats = per.agg(F.avg("n_ev").alias("avg_ev"))
    return per.crossJoin(F.broadcast(stats)).select(
        "user_id",
        F.when(F.col("n_ev") >= 2 * F.col("avg_ev"), F.lit("heavy"))
        .otherwise(F.lit("light")).alias("segment"),
    ).localCheckpoint(eager=False)


def _segment_rollup(joined: DataFrame) -> DataFrame:
    # deliberately NO countDistinct(user_id) here: a distinct aggregate whose
    # keys include the join key makes the join's hashpartitioning
    # load-bearing (the distinct-dedup stage reuses it, exchange elided), so
    # AQE must refuse to split the skewed partition — the split would break
    # the clustering guarantee. Per-segment user counts belong on the
    # DIMENSION side (O(users)), not the fact rollup. Measured (round 12).
    # EXACT sum basis (r12 ADVICE): a double sum over ~450k skewed rows is
    # order-dependent, and the twins (AQE split vs salted) deliberately
    # produce DIFFERENT partitionings — accumulated FP error could straddle
    # the round(...,6) boundary and flake the twin/oracle parity. Summing
    # decimal(18,6) is exact and order-independent (each value rounds to 6dp
    # identically in Spark and DuckDB — no double is ever exactly on a .5e-6
    # tie); one cast back to double at the end keeps the output schema.
    return joined.groupBy("segment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 6)
        .cast("double").alias("sum_value"),
    )


def events_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(segment, event_type, n_events, sum_value): the fact ⨝ dimension join
    on a key whose real-world distribution is SKEWED — event streams
    concentrate on power users, so the heavy user's partition dwarfs the
    rest when the dimension is too large to broadcast and the join
    sort-merges. This declarative form is the AQE twin: at run time adaptive
    execution detects the oversized partition and splits it across tasks,
    duplicating the matching dim partition (``spark.sql.adaptive.skewJoin.
    enabled``, on in the session factory — tests/test_skew.py pins the
    ``SortMergeJoin(skew=true)`` / ``AQEShuffleRead skewed`` markers in the
    final plan on a deliberately hot key, and tools/skew_bench.py measures
    the split). Two structural preconditions for the runtime split, both
    measured in round 12 and documented at the helpers: the dimension must
    be a materialized leaf (``_user_segment_dim``) and the rollup must not
    anchor the join's partitioning with a distinct aggregate on the join
    key (``_segment_rollup``). The salted twin
    (:func:`events_segment_revenue_salted`) is the compile-time fallback
    for joins AQE can't re-plan; identical results, same oracle."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    return _segment_rollup(ev.join(_user_segment_dim(ev), "user_id"))


def events_segment_revenue_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted twin of :func:`events_segment_revenue`: each fact row gets a
    random salt and the dimension explodes ``n_salts``× so the hot user's
    rows spread over ``n_salts`` tasks regardless of runtime re-planning
    (``functions.skew.salted_broadcast_left``). Value-identical — the salt
    only changes partitioning — so the twins share one oracle."""
    from tf_idf_using_mapreduce_spark.functions.skew import salted_broadcast_left

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    joined = salted_broadcast_left(ev, _user_segment_dim(ev), "user_id", n_salts=8)
    return _segment_rollup(joined)


EVENTS_SEGMENT_REVENUE_ORACLE = """
WITH per AS (SELECT user_id, count(*) AS n_ev FROM events GROUP BY user_id),
st AS (SELECT avg(n_ev) AS avg_ev FROM per),
dim AS (
  SELECT user_id,
         CASE WHEN n_ev >= 2 * avg_ev THEN 'heavy' ELSE 'light' END AS segment
  FROM per, st
)
SELECT d.segment, e.event_type, count(*) AS n_events,
       CAST(round(sum(CAST(e.value AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_value
FROM events e JOIN dim d ON d.user_id = e.user_id
GROUP BY 1, 2
"""


# `ts IS NOT NULL` pins the engines' shared event-time rule: a NULL event
# time has no window — Spark's window()/session_window()/watermark all drop
# such rows (batch and streaming alike), so the oracle must too (found by
# the NULL-payload corpus sweep, tools/degenerate_check.py --nulls)
EVENTS_HOURLY_ORACLE = """
SELECT strftime(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M') AS window_start,
       event_type, count(*) AS n, round(sum(value), 6) AS sum_value
FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
"""
