"""Binned range join: DuckDB oracle parity (inequality-join oracle vs
the equi-join-on-bins plan; registry capped at 50 entries), bin-width
invariance, and the no-nested-loop plan property."""

from __future__ import annotations

from pyspark.sql import functions as F

from fledge_south_csvplayback_spark.operators import events
from tests.conftest import ORACLE_SF_DIR, TEST_SF_DIR
from tests.oracle_harness import compare


def test_purchase_window_oracle_parity(spark):
    df = events.events_purchase_window(spark, TEST_SF_DIR)
    ok, msg = compare(df, events.EVENTS_PURCHASE_WINDOW_SQL, TEST_SF_DIR)
    assert ok, msg


def test_purchase_window_oracle_parity_sf001(spark):
    df = events.events_purchase_window(spark, ORACLE_SF_DIR)
    ok, msg = compare(df, events.EVENTS_PURCHASE_WINDOW_SQL, ORACLE_SF_DIR)
    assert ok, msg


def test_range_join_bin_width_invariant(spark):
    """The bin size is a physical knob (skew control), not semantics:
    finer bins must produce the identical pair set."""
    ev = events._events(spark, TEST_SF_DIR)
    anchors = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("anchor_id"), F.col("ts").alias("a_ts")
    )
    probes = ev.select("event_id", "ts")
    coarse = {
        (r.anchor_id, r.event_id)
        for r in events.range_join(
            anchors, probes, "a_ts", "ts", events.RANGE_WINDOW_S
        ).collect()
    }
    fine = {
        (r.anchor_id, r.event_id)
        for r in events.range_join(
            anchors, probes, "a_ts", "ts", events.RANGE_WINDOW_S, bin_s=600
        ).collect()
    }
    assert coarse == fine
    assert coarse  # non-empty on the fixture data


def test_range_join_boundary_semantics(spark):
    """Interval is half-open [t, t+W): a probe exactly at t matches,
    a probe exactly at t+W does not — checked on a hand-built frame
    including an anchor sitting exactly on a bin boundary."""
    from datetime import datetime

    anchors = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 0, 0))], "anchor_id long, a_ts timestamp"
    )
    probes = spark.createDataFrame(
        [
            (10, datetime(2024, 1, 1, 10, 0, 0)),  # == t -> in
            (11, datetime(2024, 1, 1, 10, 59, 59, 999999)),  # t+W-1us -> in
            (12, datetime(2024, 1, 1, 11, 0, 0)),  # == t+W -> out
            (13, datetime(2024, 1, 1, 9, 59, 59, 999999)),  # < t -> out
        ],
        "event_id long, ts timestamp",
    )
    got = {
        r.event_id
        for r in events.range_join(anchors, probes, "a_ts", "ts", 3600).collect()
    }
    assert got == {10, 11}


def test_range_join_no_nested_loop(spark):
    """The point of binning: an equi-join on the bin key, never the
    BroadcastNestedLoopJoin Spark plans for a raw inequality join."""
    plan = (
        events.events_purchase_window(spark, TEST_SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_range_join_randomized_vs_reference(spark):
    """Randomized adversarial check (seeded, deterministic): the
    binned plan must equal an O(n^2) Python reference on timestamps
    engineered to sit on/near bin and window boundaries, across
    window/bin combinations including bin sizes that do not divide the
    window. (Per-example hypothesis would spawn a Spark job per draw;
    one seeded dataset per parameterization keeps the same coverage at
    3 jobs.)"""
    import random
    from datetime import datetime, timedelta

    rng = random.Random(42)
    base = datetime(2024, 3, 1)
    # cluster timestamps around multiples of 600s with jitter in
    # {-1us, 0, +1us, random} so bin/window edges are hit constantly
    stamps = []
    for i in range(160):
        anchor_s = rng.randrange(0, 48) * 600
        jitter = rng.choice([-1, 0, 1, rng.randrange(-5_000_000, 5_000_000)])
        stamps.append(base + timedelta(seconds=anchor_s, microseconds=jitter))
    anchors = [(i, stamps[i]) for i in range(50)]
    probes = [(100 + i, s) for i, s in enumerate(stamps)]
    adf = spark.createDataFrame(anchors, "anchor_id long, a_ts timestamp")
    pdf = spark.createDataFrame(probes, "event_id long, ts timestamp")

    for window_s, bin_s in ((600, None), (600, 450), (900, 247)):
        got = {
            (r.anchor_id, r.event_id)
            for r in events.range_join(
                adf, pdf, "a_ts", "ts", window_s, bin_s=bin_s
            ).collect()
        }
        want = {
            (aid, eid)
            for aid, a_ts in anchors
            for eid, ts in probes
            if a_ts <= ts < a_ts + timedelta(seconds=window_s)
        }
        assert got == want, (window_s, bin_s, len(got), len(want))
