"""Bucketed tables for co-located fact-fact joins (100 TB scale path).

A recurring join key (orders ⨝ lineitem on orderkey) shuffles both
fact tables every query. Bucketing both sides by the key at write time
pre-partitions the data so the join runs with NO Exchange — at 100 TB
that converts the dominant network cost of every downstream query into
a one-time write cost. The test suite asserts the Exchange-free plan.

Spark bucketing requires catalog tables (``bucketBy`` +
``saveAsTable``); the in-memory catalog works — no Hive metastore
needed locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
) -> None:
    """Write df as a bucketed+sorted catalog table keyed for joins."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables; planner elides both Exchanges."""
    return spark.table(left_table).join(spark.table(right_table), key)
