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


def test_strptime_two_digit_year_pivot(spark):
    """Python's strptime (and pandas, the reference's engine) pivots
    two-digit years at 69: 69-99 are 19xx, 00-68 are 20xx. The JDK
    'yy' field reads all hundred into 2000-2099 — '78-01-07' parsed a
    century late before the round-13 fix. parse_strptime applies the
    POSIX pivot; %Y formats are untouched."""
    import datetime

    from pyspark.sql import functions as F

    from fledge_south_csvplayback_spark.operators import timestamps as T

    rows = [("78-01-07 07:38:01",), ("68-12-31 23:59:59",), ("99-06-15 00:00:00",),
            ("00-01-01 00:00:00",), ("69-01-01 00:00:00",)]
    df = spark.createDataFrame(rows, "s string")
    got = {
        r.s: r.ts
        for r in df.select(
            "s", T.parse_strptime(F.col("s"), "%y-%m-%d %H:%M:%S").alias("ts")
        ).collect()
    }
    for (s,) in rows:
        exp = datetime.datetime.strptime(s, "%y-%m-%d %H:%M:%S")
        assert got[s] == exp, (s, got[s], exp)
    # four-digit years keep their century
    df4 = spark.createDataFrame([("2078-01-07 07:38:01",)], "s string")
    r = df4.select(T.parse_strptime(F.col("s"), "%Y-%m-%d %H:%M:%S").alias("ts")).collect()[0]
    assert r.ts.year == 2078


def test_strptime_translation_fuzz(spark):
    """Seeded fuzz: random supported-directive format assemblies over
    random datetimes, strftime'd by Python and parsed back by BOTH
    engines — the net that caught the %y century pivot in round 13.
    Formats mixing date/time/%z/AM-PM/fractions all round-trip to
    Python's strptime value (tz-aware values compared as UTC)."""
    import datetime
    import random

    from pyspark.sql import functions as F

    from fledge_south_csvplayback_spark.operators import timestamps as T

    random.seed(11)
    date_parts = ["%Y-%m-%d", "%d/%m/%Y", "%Y/%m/%d", "%d %b %Y",
                  "%d %B %Y", "%y-%m-%d", "%Y-%j"]
    time_parts = ["%H:%M:%S", "%H:%M:%S.%f", "%I:%M:%S %p", "%H:%M"]
    cases = []
    for _ in range(60):
        fmt = random.choice(date_parts) + random.choice([" ", "T"]) + random.choice(time_parts)
        if random.random() < 0.4:
            fmt += random.choice([" ", ""]) + "%z"
        dt = datetime.datetime(
            random.randint(1971, 2038), random.randint(1, 12), random.randint(1, 28),
            random.randint(0, 23), random.randint(0, 59), random.randint(0, 59),
            random.choice([0, 125000, 999999]),
        )
        if "%z" in fmt:
            off = random.choice([0, 330, -480, 60])
            dt = dt.replace(tzinfo=datetime.timezone(datetime.timedelta(minutes=off)))
        s = dt.strftime(fmt)
        try:
            back = datetime.datetime.strptime(s, fmt)
        except ValueError:
            continue
        if back.tzinfo is not None:
            back = back.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        cases.append((s, fmt, back))
    assert len(cases) >= 40
    df = spark.createDataFrame([(s, fmt) for s, fmt, _ in cases], "s string, fmt string")
    # one parse expression per distinct format, applied to its rows
    for fmt in sorted({f for _, f, _ in cases}):
        sub = [c for c in cases if c[1] == fmt]
        sdf = spark.createDataFrame([(s,) for s, _, _ in sub], "s string")
        got = sdf.select("s", T.parse_strptime(F.col("s"), fmt).alias("ts")).collect()
        by_s = {r.s: r.ts for r in got}
        for s, _, back in sub:
            assert by_s[s] == back, (fmt, s, by_s[s], back)
