"""Salted join must be row-identical to the plain join."""

from __future__ import annotations

from collections import Counter

from fledge_south_csvplayback_spark.operators.skew import salted_join
from tests.conftest import TEST_SF_DIR


def test_salted_join_equals_plain_join(spark):
    orders = spark.read.parquet(f"{TEST_SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{TEST_SF_DIR}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, customer, "o_custkey").select(
        "o_orderkey", "c_name"
    )
    a = Counter(tuple(r) for r in plain.collect())
    b = Counter(tuple(r) for r in salted.collect())
    assert a == b
