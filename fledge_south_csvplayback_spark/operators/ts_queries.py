"""Oracle-checkable queries for timestamp synthesis T1-T5.

Anchors/chunk sizes are fixed parameters so both engines compute the
identical deterministic series (see operators/timestamps.py docstring
for how the reference's wall-clock anchors are made reproducible).
Row order comes from an explicit unique column (the fixtures'
timestamp strings are fixed-width, so string sort == chronological
sort in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fledge_south_csvplayback_spark.operators import timestamps as ts
from fledge_south_csvplayback_spark.operators.csv_queries import _fx
from fledge_south_csvplayback_spark.sources import csv_source as cs

TS_FMT = "%Y-%m-%d %H:%M:%S.%f%z"  # reference default, csvplayback.py:198-206

_TIMESTAMPED_SCHEMA = "ts string, channel1 double, channel2 double"
_TIMESTAMPED_DUCK = (
    "read_csv('{path}', header=true, columns={{'ts': 'VARCHAR', "
    "'channel1': 'DOUBLE', 'channel2': 'DOUBLE'}})"
).format(path=_fx("timestamped.csv"))

_VIBRATION_SCHEMA = "channel1 double, channel2 double, user_ts string"
_VIBRATION_DUCK = (
    "read_csv('{path}', header=true, columns={{'channel1': 'DOUBLE', "
    "'channel2': 'DOUBLE', 'user_ts': 'VARCHAR'}})"
).format(path=_fx("vibration.csv"))

ANCHOR = "2021-06-01 00:00:00"
DELTA_ANCHOR = "2022-01-01 00:00:00"
CHUNK = 500  # vibration.csv has 2000 data rows -> 4 chunks


def _timestamped(spark: SparkSession) -> DataFrame:
    return cs.read_pick_from_file(
        spark, _fx("timestamped.csv"), schema=_TIMESTAMPED_SCHEMA
    )


def _vibration(spark: SparkSession) -> DataFrame:
    return cs.read_pick_from_file(
        spark, _fx("vibration.csv"), schema=_VIBRATION_SCHEMA
    )


# --- T3 ---------------------------------------------------------------------
def ts_copy_csv_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts.copy_csv_value(_timestamped(spark), "ts", TS_FMT)


TS_COPY_SQL = f"""
SELECT ts, channel1, channel2,
       CAST(strptime(ts, '%Y-%m-%d %H:%M:%S.%f%z') AS TIMESTAMP) AS timestamp
FROM {_TIMESTAMPED_DUCK}
"""


# --- T4 ---------------------------------------------------------------------
def ts_move_csv_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts.move_csv_value(_timestamped(spark), "ts", TS_FMT)


TS_MOVE_SQL = f"""
SELECT channel1, channel2,
       CAST(strptime(ts, '%Y-%m-%d %H:%M:%S.%f%z') AS TIMESTAMP) AS timestamp
FROM {_TIMESTAMPED_DUCK}
"""


# --- T3+T4 fold (round-11 registry rotation) ---------------------------------
def ts_copy_move_csv_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 (copy) and T4 (move) share the timestamped fixture and the
    strptime conversion, differing only in whether the source column
    survives, so they fold into ONE mode-tagged union (COVERAGE.md
    selection rule) — move rows carry a NULL ``ts``, which IS the
    behavior under test, hash-visible per row; the unmerged callables
    stay public + pytest-oracle-checked. The freed slot registers
    ``corpus_profile``."""
    from pyspark.sql import functions as F

    copy = ts_copy_csv_value(spark, sf_dir).select(
        F.lit("copy").alias("mode"), "ts", "channel1", "channel2", "timestamp"
    )
    move = ts_move_csv_value(spark, sf_dir).select(
        F.lit("move").alias("mode"),
        F.lit(None).cast("string").alias("ts"),
        "channel1",
        "channel2",
        "timestamp",
    )
    return copy.unionByName(move)


TS_COPY_MOVE_SQL = f"""
SELECT 'copy' AS mode, ts, channel1, channel2, timestamp
FROM ({TS_COPY_SQL})
UNION ALL
SELECT 'move' AS mode, NULL::VARCHAR AS ts, channel1, channel2, timestamp
FROM ({TS_MOVE_SQL})
"""


# --- T2 ---------------------------------------------------------------------
def ts_current_time_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts.current_time_burst(
        _vibration(spark), ["user_ts"], ANCHOR, CHUNK, period_s=1.0
    )


TS_BURST_SQL = f"""
WITH n AS (
    SELECT *, row_number() OVER (ORDER BY user_ts) - 1 AS k
    FROM {_VIBRATION_DUCK}
)
SELECT channel1, channel2, user_ts,
       TIMESTAMP '{ANCHOR}' + to_microseconds((k // {CHUNK}) * 1000000)
           AS timestamp
FROM n
"""


# --- T1 ---------------------------------------------------------------------
def ts_current_time_continuous(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts.current_time_continuous(
        _vibration(spark), ["user_ts"], ANCHOR, CHUNK, period_s=1.0
    )


TS_CONTINUOUS_SQL = f"""
WITH n AS (
    SELECT *, row_number() OVER (ORDER BY user_ts) - 1 AS k
    FROM {_VIBRATION_DUCK}
)
SELECT channel1, channel2, user_ts,
       date_trunc('second',
           TIMESTAMP '{ANCHOR}' + to_microseconds((k // {CHUNK}) * 1000000))
           + to_microseconds((k % {CHUNK}) * {1_000_000 // CHUNK}) AS timestamp
FROM n
"""


# --- T5 ---------------------------------------------------------------------
def ts_sample_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts.sample_delta(
        _timestamped(spark), ["ts"], "ts", TS_FMT, DELTA_ANCHOR
    )


TS_DELTA_SQL = f"""
WITH n AS (
    SELECT *, row_number() OVER (ORDER BY ts) - 1 AS k
    FROM {_TIMESTAMPED_DUCK}
),
p AS (
    SELECT k, CAST(strptime(ts, '%Y-%m-%d %H:%M:%S.%f%z') AS TIMESTAMP) AS pts
    FROM n WHERE k < 2
),
d AS (
    SELECT epoch_us(max_by(pts, k)) - epoch_us(min_by(pts, k)) AS delta_us
    FROM p
)
SELECT ts, channel1, channel2,
       TIMESTAMP '{DELTA_ANCHOR}' + to_microseconds(k * delta_us) AS timestamp
FROM n, d
"""


# --- T1+T2 union (round-10 registry fold) ------------------------------------
def ts_current_time_stamping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-10 registry fold (COVERAGE.md selection rule): burst and
    continuous stamping emit the same (channel1, channel2, user_ts,
    timestamp) schema over the same vibration fixture and differ only
    in the within-chunk spread, so they fold into ONE mode-tagged
    union — every constituent row stays hash-distinguishable; the
    unmerged callables stay public + pytest-oracle-checked."""
    from pyspark.sql import functions as F

    burst = ts_current_time_burst(spark, sf_dir).withColumn(
        "mode", F.lit("burst")
    )
    cont = ts_current_time_continuous(spark, sf_dir).withColumn(
        "mode", F.lit("continuous")
    )
    return burst.unionByName(cont)


TS_CURRENT_TIME_SQL = f"""
SELECT *, 'burst' AS mode FROM ({TS_BURST_SQL})
UNION ALL
SELECT *, 'continuous' AS mode FROM ({TS_CONTINUOUS_SQL})
"""
