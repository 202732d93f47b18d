"""Driver-contract smoke query for the streaming playback path.

Runs a real Structured Streaming pass (file source -> burst stamping ->
envelope -> foreachBatch) over the committed multi-file fixture
directory and returns the collected readings as a DataFrame. Wall-clock
anchors make values nondeterministic, so this registers rows-only (the
driver's weaker check); the deterministic envelope math is separately
oracle-checked by the reading_envelope* queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fledge_south_csvplayback_spark.config import PlaybackConfig
from fledge_south_csvplayback_spark.operators.csv_queries import _fx
from fledge_south_csvplayback_spark.operators.readings import explode_envelope
from fledge_south_csvplayback_spark.streaming.playback import PlaybackSession

_SCHEMA = "channel1 string, channel2 string, user_ts string"


def playback_stream_smoke(spark: SparkSession, sf_dir: str) -> DataFrame:
    cfg = PlaybackConfig(csv_dir_name=_fx("multi"), csv_file_name="vib")
    session = PlaybackSession(spark, cfg, _SCHEMA)
    q = session.start_polling(available_now=True)
    rows = []
    while True:
        batch = session.poll()
        if batch is None:
            break
        rows.extend(batch)
    q.awaitTermination()
    # Flatten the readings map: the driver's canonicalizer sorts/hashes
    # pandas cells, and a map column materializes as an unhashable dict.
    return explode_envelope(spark.createDataFrame(rows))
