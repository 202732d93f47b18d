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
