"""Multi-granularity GROUPING SETS rollup: oracle parity, grain
consistency, and the one-pass plan property."""

from __future__ import annotations

from pyspark.sql import functions as F

from fledge_south_csvplayback_spark.operators import events
from tests.conftest import ORACLE_SF_DIR, TEST_SF_DIR
from tests.oracle_harness import compare


def test_multi_rollup_oracle_parity(spark):
    df = events.events_multi_rollup(spark, TEST_SF_DIR)
    ok, msg = compare(df, events.EVENTS_MULTI_ROLLUP_SQL, TEST_SF_DIR)
    assert ok, msg


def test_multi_rollup_oracle_parity_sf001(spark):
    df = events.events_multi_rollup(spark, ORACLE_SF_DIR)
    ok, msg = compare(df, events.EVENTS_MULTI_ROLLUP_SQL, ORACLE_SF_DIR)
    assert ok, msg


def test_multi_rollup_grains_consistent(spark):
    """Each grain's counts must sum to the same corpus total, and the
    hour grain must equal the registered hourly rollup."""
    rows = events.events_multi_rollup(spark, TEST_SF_DIR).collect()
    by_grain: dict[str, int] = {}
    for r in rows:
        by_grain[r.grain] = by_grain.get(r.grain, 0) + r.n
    assert by_grain["hour"] == by_grain["day"] == by_grain["all"]
    hourly = {
        (r.hour, r.event_type): r.n
        for r in events.events_hourly_rollup(spark, TEST_SF_DIR).collect()
    }
    got_hour = {
        (r.bucket, r.event_type): r.n for r in rows if r.grain == "hour"
    }
    assert got_hour == hourly


def test_multi_rollup_single_pass(spark):
    """GROUPING SETS must expand inside one aggregate: a single wide
    Exchange (plus Expand), never three scans unioned."""
    plan = (
        events.events_multi_rollup(spark, TEST_SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Union" not in plan
    assert plan.count("FileScan parquet") <= 1
