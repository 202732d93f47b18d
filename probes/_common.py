"""Shared scaffolding for the scale probes (BASELINE.md rows).

One copy of the UI-REST metrics reader and the probe session builder so
an endpoint or sentinel fix cannot be applied to one probe and missed
in the other.
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import SparkSession

PROBE_ROOT = "/tmp/spark_graft_probe"


def probe_session(app_name: str) -> SparkSession:
    from fledge_south_csvplayback_spark.session import get_spark

    spark = get_spark(
        app_name=app_name,
        extra_conf={
            "spark.ui.enabled": "true",  # REST API is the shuffle-bytes source
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def shuffle_write_bytes(spark: SparkSession) -> int:
    """Total shuffle write bytes across all stages, from the UI REST
    API; -1 when the UI is unavailable (callers must treat any negative
    before/after delta as 'unknown', not as a real byte count)."""
    url = spark.sparkContext.uiWebUrl
    if not url:
        return -1
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{url}/api/v1/applications/{app}/stages", timeout=10
        ) as r:
            stages = json.load(r)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:  # noqa: BLE001 — metrics are best-effort, never fail a probe
        return -1


def shuffle_delta(before: int, after: int) -> int:
    """Delta of two shuffle_write_bytes reads; -1 if either was unknown."""
    if before < 0 or after < 0:
        return -1
    return after - before
