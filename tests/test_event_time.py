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
