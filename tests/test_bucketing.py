"""Bucketed co-located join: correct rows, and no shuffle in the plan."""

from __future__ import annotations

import pytest

from fledge_south_csvplayback_spark.operators import bucketing
from tests.conftest import TEST_SF_DIR


@pytest.fixture(scope="module")
def bucketed_db(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{loc}'")
    orders = spark.read.parquet(f"{TEST_SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{TEST_SF_DIR}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    bucketing.write_bucketed(orders, "bktest.orders_b", "o_orderkey")
    bucketing.write_bucketed(lineitem, "bktest.lineitem_b", "o_orderkey")
    yield "bktest"
    spark.sql("DROP DATABASE bktest CASCADE")


def test_colocated_join_has_no_exchange(spark, bucketed_db):
    # at fixture scale the planner would broadcast; disable it so the
    # bucketed sort-merge path (the 100 TB shape) is what gets planned
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.colocated_join(
            spark, "bktest.orders_b", "bktest.lineitem_b", "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_colocated_join_rows_match_plain(spark, bucketed_db):
    joined = bucketing.colocated_join(
        spark, "bktest.orders_b", "bktest.lineitem_b", "o_orderkey"
    )
    orders = spark.read.parquet(f"{TEST_SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{TEST_SF_DIR}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    assert joined.count() == orders.join(lineitem, "o_orderkey").count()
