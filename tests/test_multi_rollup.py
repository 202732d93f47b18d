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


# --- multi-step funnel -------------------------------------------------------
def test_funnel_oracle_parity(spark):
    df = events.events_funnel(spark, TEST_SF_DIR)
    ok, msg = compare(df, events.EVENTS_FUNNEL_SQL, TEST_SF_DIR)
    assert ok, msg


def test_funnel_oracle_parity_sf001(spark):
    df = events.events_funnel(spark, ORACLE_SF_DIR)
    ok, msg = compare(df, events.EVENTS_FUNNEL_SQL, ORACLE_SF_DIR)
    assert ok, msg


def test_funnel_planted_partial_funnels(spark, tmp_path):
    """The driver corpus converts every user 3/3, so the ordering and
    strictness rules are pinned on planted partial funnels: steps
    break at a missing view, an out-of-order click, a purchase before
    the qualified click, and same-instant events (strictly-after)."""
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1: clean 3-step conversion
        (1, t(1), 1, "view", 1.0, "{}"),
        (2, t(2), 1, "click", 1.0, "{}"),
        (3, t(3), 1, "purchase", 1.0, "{}"),
        # u2: early click ignored; same-ts click as view ignored
        # (strict >); purchase BEFORE the qualified click -> steps 2
        (4, t(1), 2, "click", 1.0, "{}"),
        (5, t(2), 2, "view", 1.0, "{}"),
        (6, t(2), 2, "click", 1.0, "{}"),
        (7, t(3), 2, "purchase", 1.0, "{}"),
        (8, t(4), 2, "click", 1.0, "{}"),
        # u3: purchase only -> steps 0
        (9, t(1), 3, "purchase", 1.0, "{}"),
        # u4: click before the only view -> steps 1
        (10, t(4), 4, "click", 1.0, "{}"),
        (11, t(5), 4, "view", 1.0, "{}"),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(f"{sf_dir}/events.parquet")
    got = {
        r.user_id: (r.view_ts, r.click_ts, r.purchase_ts, r.steps)
        for r in events.events_funnel(spark, sf_dir).collect()
    }
    assert got[1] == (t(1), t(2), t(3), 3)
    assert got[2] == (t(2), t(4), None, 2)
    assert got[3] == (None, None, None, 0)
    assert got[4] == (t(5), None, None, 1)
    ok, msg = compare(
        events.events_funnel(spark, sf_dir), events.EVENTS_FUNNEL_SQL, sf_dir
    )
    assert ok, msg


def test_funnel_single_exchange_plan(spark):
    """One shuffle for the whole funnel: both running windows share
    the (user_id; ts, event_id) sort, and the per-user rollup reuses
    the window's partitioning."""
    df = events.events_funnel(spark, TEST_SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split(
        "Initial Plan"
    )[0]
    ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(ex) == 1, plan
    assert "Join" not in plan, plan


# --- cohort retention --------------------------------------------------------
def test_retention_oracle_parity(spark):
    df = events.events_retention(spark, TEST_SF_DIR)
    ok, msg = compare(df, events.EVENTS_RETENTION_SQL, TEST_SF_DIR)
    assert ok, msg


def test_retention_oracle_parity_sf001(spark):
    df = events.events_retention(spark, ORACLE_SF_DIR)
    ok, msg = compare(df, events.EVENTS_RETENTION_SQL, ORACLE_SF_DIR)
    assert ok, msg


def test_retention_semantics(spark, tmp_path):
    """Planted cohorts: a user active in its first and third week
    counts at offsets 0 and 2 only; distinct users, not events; a
    later-joining user forms its own cohort; every user contributes
    to its cohort's offset 0."""
    import datetime as dt

    mon = dt.datetime(2024, 1, 1)  # a Monday
    day = dt.timedelta(days=1)
    week = dt.timedelta(days=7)
    rows = [
        (1, mon + day, 1, "view", 1.0, "{}"),           # u1 cohort wk0
        (2, mon + day + day, 1, "view", 1.0, "{}"),     # same week, distinct once
        (3, mon + 2 * week + day, 1, "view", 1.0, "{}"),  # offset 2
        (4, mon + week, 2, "view", 1.0, "{}"),          # u2 cohort wk1
        (5, mon + week + 3 * day, 2, "view", 1.0, "{}"),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(f"{sf_dir}/events.parquet")
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in events.events_retention(spark, sf_dir).collect()
    }
    wk0, wk1 = mon.date(), (mon + week).date()
    assert got == {(wk0, 0): 1, (wk0, 2): 1, (wk1, 0): 1}
    ok, msg = compare(
        events.events_retention(spark, sf_dir), events.EVENTS_RETENTION_SQL, sf_dir
    )
    assert ok, msg


# --- pivot / unpivot ---------------------------------------------------------
def test_pivot_oracle_parity(spark):
    df = events.events_type_pivot(spark, TEST_SF_DIR)
    ok, msg = compare(df, events.EVENTS_TYPE_PIVOT_SQL, TEST_SF_DIR)
    assert ok, msg


def test_pivot_oracle_parity_sf001(spark):
    df = events.events_type_pivot(spark, ORACLE_SF_DIR)
    ok, msg = compare(df, events.EVENTS_TYPE_PIVOT_SQL, ORACLE_SF_DIR)
    assert ok, msg


def test_unpivot_oracle_parity(spark):
    df = events.events_type_unpivot(spark, TEST_SF_DIR)
    ok, msg = compare(df, events.EVENTS_TYPE_UNPIVOT_SQL, TEST_SF_DIR)
    assert ok, msg


def test_pivot_unpivot_roundtrip(spark):
    """unpivot(pivot(events)) with zero cells dropped equals the plain
    (user_id, event_type) count aggregate."""
    long = {
        (r.user_id, r.event_type): r.n
        for r in events.events_type_unpivot(spark, TEST_SF_DIR)
        .filter(F.col("n") > 0)
        .collect()
    }
    from fledge_south_csvplayback_spark.operators.events import _events

    want = {
        (r.user_id, r.event_type): r.n
        for r in _events(spark, TEST_SF_DIR)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert long == want


def test_pivot_single_exchange(spark):
    """The conditional-count formulation: one grouped aggregate, one
    Exchange — DataFrame.pivot's PivotFirst two-exchange plan is the
    documented rejected alternative."""
    df = events.events_type_pivot(spark, TEST_SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split(
        "Initial Plan"
    )[0]
    ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(ex) == 1, plan
    assert "PivotFirst" not in plan, plan
