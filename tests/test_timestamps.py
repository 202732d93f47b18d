"""Unit tests for timestamp synthesis T1-T5.

Semantics cross-checked against the reference formulas
(csvplayback.py:717-756) computed in plain Python over the fixtures.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from fledge_south_csvplayback_spark.operators import timestamps as ts
from fledge_south_csvplayback_spark.operators.ts_queries import (
    ANCHOR,
    CHUNK,
    DELTA_ANCHOR,
    ts_current_time_continuous,
    ts_sample_delta,
)


@pytest.mark.parametrize(
    "fmt,expected",
    [
        ("%Y-%m-%d %H:%M:%S.%f%z", "yyyy-MM-dd HH:mm:ss.SSSSSS[XXX][XX]"),
        ("%Y-%m-%dT%H:%M:%S", "yyyy-MM-dd'T'HH:mm:ss"),
        ("%d/%m/%y %I:%M %p", "dd/MM/yy hh:mm a"),
        ("%Y%m%d", "yyyyMMdd"),
    ],
)
def test_strptime_to_jdk(fmt, expected):
    assert ts.strptime_to_jdk(fmt) == expected


def test_strptime_to_jdk_rejects_unknown():
    with pytest.raises(ValueError):
        ts.strptime_to_jdk("%Q")


def test_offset_forms_match_python_strptime(spark):
    """python %z accepts +HHMM, +HH:MM, and Z; the JDK translation
    must parse all three to the same instant (round-12 sweep: the
    plain 'Z' pattern raised on colon offsets that pandas and the
    reference's default format accept), and short %f fractions parse
    leniently like python's."""
    from datetime import datetime, timezone

    from pyspark.sql import functions as F

    fmt = "%Y-%m-%d %H:%M:%S.%f%z"
    jdk = ts.strptime_to_jdk(fmt)
    cases = [
        "2020-01-01 00:00:00.500000+0000",
        "2020-01-01 00:00:00.500000+00:00",
        "2020-01-01 00:00:00.5+0000",
        "2020-01-01 00:00:00.123456+0530",
        "2020-01-01 00:00:00.123456+05:30",
    ]
    got = [
        r[0]
        for r in spark.createDataFrame([(c,) for c in cases], "s string")
        .select(F.to_timestamp("s", jdk))
        .collect()
    ]
    want = [
        datetime.strptime(c, fmt).astimezone(timezone.utc).replace(tzinfo=None)
        for c in cases
    ]
    assert got == want


@pytest.mark.parametrize(
    "fmt",
    [
        "%Y-%m-%d %H:%M:%S.%f%z",
        "%Y-%m-%dT%H:%M:%S",
        "%d/%m/%Y %H:%M",
    ],
)
def test_parse_roundtrip_matches_python_strptime(spark, fmt):
    """Property: Spark to_timestamp(strptime_to_jdk(fmt)) == Python
    strptime for a seeded spread of datetimes."""
    import random
    from datetime import datetime, timedelta, timezone

    rng = random.Random(42)
    base = datetime(2000, 1, 1, tzinfo=timezone.utc)
    dts = [
        base
        + timedelta(
            days=rng.randint(0, 9000),
            seconds=rng.randint(0, 86399),
            microseconds=rng.randint(0, 999999),
        )
        for _ in range(50)
    ]
    formatted = [d.strftime(fmt) for d in dts]
    expected = [
        datetime.strptime(s, fmt)
        .astimezone(timezone.utc)
        .replace(tzinfo=None)
        if "%z" in fmt
        else datetime.strptime(s, fmt)
        for s in formatted
    ]
    df = spark.createDataFrame([(s,) for s in formatted], "s string")
    got = [r.timestamp for r in ts.copy_csv_value(df, "s", fmt).collect()]
    assert got == expected


def test_continuous_spread_matches_reference_formula(spark):
    # reference: row i of chunk c -> anchor_c.replace(microsecond=i*step)
    rows = ts_current_time_continuous(spark, "").orderBy("user_ts").collect()
    anchor = datetime.fromisoformat(ANCHOR)
    step = 1_000_000 // CHUNK
    for k in (0, 1, CHUNK - 1, CHUNK, 2 * CHUNK + 7, len(rows) - 1):
        expected = (anchor + timedelta(seconds=k // CHUNK)).replace(
            microsecond=(k % CHUNK) * step
        )
        assert rows[k].timestamp == expected, k


def test_sample_delta_is_first_two_rows_spacing(spark):
    # timestamped.csv is a 125 us grid -> delta must be exactly 125 us
    rows = ts_sample_delta(spark, "").orderBy("ts").collect()
    anchor = datetime.fromisoformat(DELTA_ANCHOR)
    assert rows[0].timestamp == anchor
    assert rows[1].timestamp - rows[0].timestamp == timedelta(microseconds=125)
    assert rows[400].timestamp == anchor + timedelta(microseconds=400 * 125)
