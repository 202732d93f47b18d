"""Relational operator suite over the driver testdata star schema.

The reference has NO joins, grouped aggregation, sorts, or set ops
(SURVEY.md §2.3/§2.5/§2.7/§2.8) — this module supplies the standard
relational surface a complete engine needs, each operator written the
way it should run at 100 TB:

- Scans are parquet with filters/projection expressed declaratively so
  Catalyst pushes them into the scan (check: PushedFilters/ReadSchema
  in .explain("formatted")).
- Star-schema dimension joins are explicitly broadcast (region, nation,
  supplier, part at TPC-H proportions stay small while fact tables
  scale), so the big fact table never shuffles for them.
- Fact-fact joins (orders ⨝ lineitem) are plain equi-joins on the
  shuffle key; AQE handles skew and partition coalescing at runtime.
- Aggregates use built-in functions only — whole-stage codegen, partial
  (map-side) aggregation for free.

Every query aliases its computed columns to exact names that the
matching DuckDB oracle (``__spark_entry__.oracle_sql``) reproduces, and
rounds floating aggregates so the value-hash compare is stable across
engines' summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Q1: pricing summary (TPC-H Q1 shape) — the flagship query.
# Scan one fact table, filter (pushed to parquet), 2-key hash agg with
# 8 partial-aggregated measures, small sort. At 100 TB this is a pure
# map-side-heavy job: no join, shuffle is only |groups| * |partitions|.
# ---------------------------------------------------------------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT
    l_returnflag,
    l_linestatus,
    ROUND(SUM(l_quantity), 2)                                            AS sum_qty,
    ROUND(SUM(l_extendedprice), 2)                                       AS sum_base_price,
    ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                    AS sum_disc_price,
    ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)      AS sum_charge,
    ROUND(AVG(l_quantity), 6)                                            AS avg_qty,
    ROUND(AVG(l_extendedprice), 6)                                       AS avg_price,
    ROUND(AVG(l_discount), 6)                                            AS avg_disc,
    COUNT(*)                                                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Q5 shape: broadcast star join. region/nation are bounded dimensions
# (25/5 rows at any scale) — explicitly broadcast so the fact tables
# never shuffle for them; customer⨝orders and orders⨝lineitem are
# fact-side equi-joins on their natural keys (shuffle joins, AQE skew
# handling). Revenue by nation within one region.
# ---------------------------------------------------------------------------
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .join(orders, F.col("c_custkey") == orders.o_custkey)
        .join(lineitem, F.col("o_orderkey") == lineitem.l_orderkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc())
    )


Q5_SQL = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC
"""


# ---------------------------------------------------------------------------
# Q3 shape: fact-fact shuffle join + top-k (TakeOrderedAndProject).
# ---------------------------------------------------------------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-30").cast("timestamp")
    )
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND l_shipdate > TIMESTAMP '1996-06-30'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Window functions: per-group ranking (distributed — the window is
# partitioned by the group key, never a global sort).
# ---------------------------------------------------------------------------
def q_top_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_orderpriority", "rank", "o_orderkey", "o_totalprice")
    )


Q_WINDOW_SQL = """
SELECT o_orderpriority, rank, o_orderkey, o_totalprice
FROM (
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey
           ) AS rank
    FROM orders
)
WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# Set operations (§2.8): customers active in both/only-first of two years.
# ---------------------------------------------------------------------------
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")

    def active(year: int) -> DataFrame:
        return (
            orders.filter(F.year("o_orderdate") == year)
            .select("o_custkey")
            .distinct()
        )

    y95, y96 = active(1995), active(1996)
    both = y95.intersect(y96).select(F.lit("both").alias("op"), "o_custkey")
    only95 = y95.exceptAll(y96).select(F.lit("only_1995").alias("op"), "o_custkey")
    return both.unionByName(only95)


Q_SET_OPS_SQL = """
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
     y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
SELECT 'both' AS op, o_custkey FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
UNION ALL
SELECT 'only_1995' AS op, o_custkey FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
"""


# ---------------------------------------------------------------------------
# Top-k customers by revenue: fact-fact join + agg + TakeOrdered.
# ---------------------------------------------------------------------------
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(10)
    )


Q_TOP_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Semi/anti joins (EXISTS / NOT EXISTS): the shuffle carries only the
# customer side; the probe never widens rows.
# ---------------------------------------------------------------------------
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    big_orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    on = customer.c_custkey == big_orders.o_custkey
    with_big = customer.join(big_orders, on, "left_semi").select(
        F.lit("has_big_order").alias("op"), "c_custkey"
    )
    without_big = customer.join(big_orders, on, "left_anti").select(
        F.lit("no_big_order").alias("op"), "c_custkey"
    )
    return with_big.unionByName(without_big)


Q_SEMI_ANTI_SQL = """
SELECT 'has_big_order' AS op, c_custkey FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
UNION ALL
SELECT 'no_big_order' AS op, c_custkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


# ---------------------------------------------------------------------------
# ROLLUP: hierarchical subtotals in one pass (Catalyst expands the
# grouping sets; partial aggregation still applies).
# ---------------------------------------------------------------------------
def q1_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping_id().alias("gid"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


Q1_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       COUNT(*) AS n_rows,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""
