"""The shared small-input fan-out (operators/fanout.py, hoisted from
dedup in round 15): round-robin repartition ONLY in the
parallelism-starved regime, a no-op once the input is large enough to
split naturally or lives on a non-local store."""

from __future__ import annotations

import os

from fledge_south_csvplayback_spark.operators import fanout
from tests.conftest import TEST_SF_DIR


def _n_parts(df):
    return df.rdd.getNumPartitions()


def test_spread_fires_on_small_local_input(spark):
    path = f"{TEST_SF_DIR}/documents.parquet"
    df = spark.read.parquet(path)
    out = fanout.spread(df, spark, path)
    want = max(2, spark.sparkContext.defaultParallelism // 2)
    assert _n_parts(out) == want


def test_spread_noop_above_size_cutoff(spark):
    """Shrink the split size so the fixture crosses the cutoff: the
    frame must come back UNTOUCHED (same plan object, no repartition) —
    the scale regime where input splits already provide parallelism."""
    path = f"{TEST_SF_DIR}/documents.parquet"
    total = (
        sum(os.path.getsize(os.path.join(path, f)) for f in os.listdir(path))
        if os.path.isdir(path)
        else os.path.getsize(path)
    )
    target = max(2, spark.sparkContext.defaultParallelism // 2)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    # cutoff = target * maxPartitionBytes / 4  <= total  -> no-op
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(max(1, 4 * total // target))
    )
    try:
        df = spark.read.parquet(path)
        assert fanout.spread(df, spark, path) is df
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_spread_noop_on_unlistable_path(spark):
    """A store the driver cannot stat (object store, dead path) must
    pass through: input splits are the parallelism source there."""
    df = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
    assert fanout.spread(df, spark, "/nonexistent/bucket/table") is df


def test_parse_size_bytes_spellings():
    f = fanout._parse_size_bytes
    assert f("134217728") == 134217728
    assert f("128m") == 128 << 20
    assert f("128MB") == 128 << 20
    assert f("1G") == 1 << 30
    assert f("64k") == 64 << 10
    assert f("garbage") == 134217728  # falls back, never raises
