"""Event-time streaming: watermark window aggs converge to the batch
answer; applyInPandasWithState accumulates across micro-batches."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fledge_south_csvplayback_spark.operators.events import _events
from fledge_south_csvplayback_spark.streaming import event_time as et
from tests.conftest import TEST_SF_DIR


@pytest.fixture()
def event_files(spark, tmp_path):
    """events table split into several parquet files (micro-batch feed)."""
    src = str(tmp_path / "stream_src")
    _events(spark, TEST_SF_DIR).repartition(4).write.parquet(src)
    return src


def _run_available_now(df, tmp_path, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def test_windowed_counts_match_batch(spark, tmp_path, event_files):
    schema = spark.read.parquet(event_files).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_files)
    )
    _run_available_now(et.windowed_counts(stream), tmp_path, "win_counts")
    got = {
        (r.hour, r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = (
        _events(spark, TEST_SF_DIR)
        .groupBy(F.window("ts", "1 hour").start.alias("hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    want_n = {(r.hour, r.event_type): r.n for r in batch}
    assert {k: v[0] for k, v in got.items()} == want_n


def test_stateful_running_totals(spark, tmp_path, event_files):
    schema = spark.read.parquet(event_files).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_files)
    )
    q = (
        et.running_totals_stateful(stream)
        .writeStream.format("memory")
        .queryName("run_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_totals"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode emits one row per key per batch; the LAST emission per
    # key carries the accumulated state across all 4 input files
    rows = spark.sql("SELECT * FROM run_totals").collect()
    final: dict[int, tuple] = {}
    for r in rows:  # memory sink appends in batch order
        final[r.user_id] = (r.n_events, r.total_value)
    batch = (
        _events(spark, TEST_SF_DIR)
        .groupBy("user_id")
        .count()
        .collect()
    )
    want = {r.user_id: r["count"] for r in batch}
    assert {k: v[0] for k, v in final.items()} == want


def test_stream_dedup_exact_bounded_state(spark, tmp_path):
    # two micro-batch files with overlapping payloads: duplicates must
    # collapse across batches while distinct payloads all survive
    import datetime as dt

    t0 = dt.datetime(2021, 1, 1, 0, 0, 0)
    rows_a = [(t0, "p1"), (t0, "p2"), (t0, "p1")]
    rows_b = [(t0 + dt.timedelta(minutes=1), "p2"), (t0 + dt.timedelta(minutes=1), "p3")]
    src = str(tmp_path / "dedup_src")
    schema = "ts timestamp, payload string"
    spark.createDataFrame(rows_a, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(rows_b, schema).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        et.stream_dedup_exact(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        r.payload for r in spark.sql("SELECT * FROM dedup_stream").collect()
    )
    assert got == ["p1", "p2", "p3"]


def test_checkpoint_recovery_no_reprocessing(spark, tmp_path, event_files):
    """ST5/ST9: a restarted query resumes from the checkpointed offsets —
    files already processed are not re-counted."""
    schema = spark.read.parquet(event_files).schema
    ckpt = str(tmp_path / "ckpt_recover")

    def run(name):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(event_files)
        )
        q = (
            stream.groupBy("event_type")
            .count()
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run("recover_a")
    total_first = sum(
        r["count"] for r in spark.sql("SELECT * FROM recover_a").collect()
    )
    # restart against the same checkpoint with no new input: the memory
    # sink of the NEW query stays empty because every offset is committed
    run("recover_b")
    assert spark.sql("SELECT * FROM recover_b").count() == 0
    # append one more file, restart again: only the delta is processed
    extra = spark.read.parquet(event_files).limit(7)
    extra.coalesce(1).write.mode("append").parquet(event_files)
    run("recover_c")
    total_after = sum(
        r["count"] for r in spark.sql("SELECT * FROM recover_c").collect()
    )
    # aggregation state came back from the checkpoint and only the new
    # file was read on top of it
    assert total_after == total_first + 7


def test_enrich_stream_matches_batch_left_join(spark, tmp_path, event_files):
    """Stream-static broadcast enrichment: streamed result equals the
    batch left join, including events whose key misses the dim."""
    schema = spark.read.parquet(event_files).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_files)
    )
    batch_events = _events(spark, TEST_SF_DIR)
    # static dim covering only even user_ids so the left-join nulls path runs
    dim = (
        batch_events.select("user_id")
        .distinct()
        .filter(F.col("user_id") % 2 == 0)
        .withColumn("segment", (F.col("user_id") % 3).cast("long"))
    )
    enriched = et.enrich_stream(stream, dim).select(
        "event_id", "user_id", "segment"
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.event_id: r.segment
        for r in spark.sql("SELECT * FROM enriched").collect()
    }
    want = {
        r.event_id: r.segment
        for r in batch_events.join(dim, "user_id", "left")
        .select("event_id", "segment")
        .collect()
    }
    assert got == want
    assert None in set(got.values())  # the miss path was exercised


def test_session_windows_stream_matches_batch(spark, tmp_path, event_files):
    """Streaming session windows (merges across micro-batches included)
    converge to the identical batch session_window result, and agree
    with the batch lag-window sessionize on session counts per user."""
    schema = spark.read.parquet(event_files).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_files)
    )
    # the fixture files are in random ts order, so a tight watermark
    # would drop genuinely-late rows (session windows filter late data
    # even in complete mode); a horizon wider than the fixture's time
    # range makes the convergence exact
    _run_available_now(
        et.session_windows(stream, watermark="365 days"), tmp_path, "sess_win"
    )
    got = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM sess_win").collect()
    }
    want = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.total_value)
        for r in et.session_windows(
            spark.read.parquet(event_files), watermark="365 days"
        ).collect()
    }
    assert got == want
    # total events conserved
    ev = _events(spark, TEST_SF_DIR)
    assert sum(v[0] for v in got.values()) == ev.count()

    # agrees with the lag-window sessionize when no gap sits exactly on
    # the threshold (the documented boundary difference)
    from fledge_south_csvplayback_spark.operators import events as ev_ops

    gap_s = 4 * 3600
    w = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag("ts").over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                "user_id"
            ).orderBy("ts")
        )
    )
    exact = ev.select(w.alias("gap")).filter(
        F.col("gap") == gap_s * 1_000_000
    ).count()
    assert exact == 0, "fixture has an exactly-threshold gap; pick another gap"
    sess_counts = {
        r.user_id: r.n
        for r in ev_ops.sessionize(ev, "user_id", "ts", gap_s)
        .groupBy("user_id")
        .agg(F.max("session_id").alias("n"))
        .collect()
    }
    win_counts: dict[int, int] = {}
    for (user_id, _s, _e), _v in got.items():
        win_counts[user_id] = win_counts.get(user_id, 0) + 1
    assert win_counts == sess_counts


def test_stream_stream_range_join_matches_batch(spark, tmp_path, event_files):
    """view->click attribution joined stream-to-stream equals the
    batch inequality join over the same rows (inner-join results emit
    as they match in append mode; the wide watermark only disables
    state eviction, which on unordered fixture files would otherwise
    drop genuinely-late rows)."""
    schema = spark.read.parquet(event_files).schema

    def side(event_type):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(event_files)
            .filter(F.col("event_type") == event_type)
        )

    joined = et.stream_stream_range_join(
        side("view"), side("click"), within="1 hour", watermark="365 days"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ss_join"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.l_ts, r.r_ts): (r.l_type, r.r_type, r.l_value, r.r_value)
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }
    ev = _events(spark, TEST_SF_DIR)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("l_ts"),
        F.col("event_type").alias("l_type"),
        F.col("value").alias("l_value"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_ts"),
        F.col("event_type").alias("r_type"),
        F.col("value").alias("r_value"),
    )
    want = {
        (r.user_id, r.l_ts, r.r_ts): (r.l_type, r.r_type, r.l_value, r.r_value)
        for r in views.join(
            clicks,
            (F.col("user_id") == F.col("r_user_id"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 1 hour")),
            "inner",
        ).collect()
    }
    assert len(want) > 0  # the fixture actually exercises the join
    assert got == want


def test_asof_duplicate_ts_deterministic(spark, tmp_path):
    """Multiple right rows sharing (key, ts) must resolve
    deterministically: the window order's right-struct tiebreaker picks
    the greatest (ts, value) tuple, mirroring the oracle's per-(key,ts)
    MAX reduction — so the driver hash compare cannot flake if the
    events fixture ever gains duplicate (user_id, ts) click rows."""
    from datetime import datetime

    from fledge_south_csvplayback_spark.operators.events import asof_join

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    t1 = datetime(2024, 1, 1, 13, 0, 0)
    left = spark.createDataFrame(
        [(100, 7, t1)], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        # three clicks at the SAME (user_id, ts): max value must win
        [(7, t0, 1.0), (7, t0, 9.0), (7, t0, 4.0)],
        "user_id long, ts timestamp, value double",
    )
    out = asof_join(
        left, right, on="user_id", ts_col="ts", right_cols=["ts", "value"]
    ).collect()
    assert len(out) == 1
    assert out[0].asof_value == 9.0
    assert out[0].asof_ts == t0
