"""Reading-envelope builder (reference csvplayback.py:760-771).

The reference's output unit is the *reading* dict
``{'asset': str, 'timestamp': str, 'readings': {datapoint: value}}``
built row-by-row with ``chunk.to_dict('records')`` (csvplayback.py:746)
plus the ``pass_in_datapoint`` metadata merge (csvplayback.py:758-759).

Spark shape: one nested column build over the flat frame —
``create_map`` of the datapoint columns (+ optional metadata entry via
``map_concat``), the synthesized ``timestamp`` stringified like the
reference's ``str(...)`` (csvplayback.py:749-755). All built-ins, so
the row pivot costs one projection, no shuffle, and stays inside
whole-stage codegen; at a sink boundary the envelope serializes with
``to_json`` for free.

Internally the engine keeps columns flat as long as possible (SURVEY.md
§1.2) — the envelope is the *last* step before a sink, never an
intermediate representation.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fledge_south_csvplayback_spark.schema import qcol


def readings_map(
    df: DataFrame,
    value_cols: list[str] | None = None,
    exclude: tuple[str, ...] = ("timestamp",),
) -> Column:
    """Map of datapoint name -> value (stringified) for the given columns.

    Column references are backtick-quoted: datapoint names come from
    CSV headers, and a dotted name (e.g. the ``a.1`` pandas
    duplicate-header mangle, round 12) must not parse as a struct-field
    path — unquoted, it raised INVALID_EXTRACT_BASE_FIELD_TYPE."""
    cols = value_cols or [c for c in df.columns if c not in exclude]
    pairs = list(
        chain.from_iterable((F.lit(c), qcol(c).cast("string")) for c in cols)
    )
    return F.map_from_arrays(
        F.array(*pairs[0::2]), F.array(*pairs[1::2])
    )


def pandas_ts_string(ts: Column, tz_aware: bool = False) -> Column:
    """``str(pandas.Timestamp)`` formatting — the reference's payload
    timestamp format (csvplayback.py:749-755 wraps every emitted
    timestamp in ``str(...)``): SIX fractional digits when the
    fraction is nonzero, none when zero, and for tz-aware values (a
    ``%z`` parse in the reference) a ``+HH:MM`` suffix. Spark's
    string cast instead prints MINIMAL fractional digits
    (``.000250`` → ``'.00025'``) and never a suffix — a downstream
    consumer strptime-ing the reference's output with ``%f%z`` would
    reject the engine convention. Pinned against live
    ``str(pd.Timestamp)`` in tests/test_csv_source.py.

    ``tz_aware`` caveat (round-13 advice): the suffix comes from
    ``date_format(ts, 'xxx')`` — the SESSION timezone's offset at the
    row's instant, not the per-row offset ``str(pandas.Timestamp)``
    preserves (Spark timestamps are instants; the parsed ``%z`` offset
    is not stored). Byte parity with the reference therefore assumes a
    FIXED-OFFSET session timezone equal to the feed's offset (UTC in
    the tests) — under a DST session zone the suffix varies by date
    where pandas would keep the feed's constant offset. Feeds that
    genuinely mix per-row offsets need the offset carried as a column
    before the parse; no reference fixture does."""
    base = F.when(
        F.unix_micros(ts) % 1_000_000 == 0,
        F.date_format(ts, "yyyy-MM-dd HH:mm:ss"),
    ).otherwise(F.date_format(ts, "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    if tz_aware:
        base = F.concat(base, F.date_format(ts, "xxx"))
    return base


def build_envelope(
    df: DataFrame,
    asset: str,
    ts_col: str = "timestamp",
    value_cols: list[str] | None = None,
    metadata: str | None = None,
    metadata_key: str = "metadata",
    readings_col: Column | None = None,
    ts_format: str = "engine",
    ts_tz_aware: bool = False,
) -> DataFrame:
    """(asset string, timestamp string, readings map<string,string>).

    ``readings_col`` short-circuits the map build for ragged mode, where
    the reader already produced a readings map (csv_source.read_ragged).
    ``metadata`` merges the pass_in_datapoint header capture into every
    reading under ``metadata_key`` (csvplayback.py:758-759).

    ``ts_format`` picks the string form of a TYPED timestamp column
    (string columns pass through either way): ``"engine"`` (default,
    the oracle-checked Spark/DuckDB minimal-digits cast) or
    ``"pandas"`` — ``str(pandas.Timestamp)`` via
    :func:`pandas_ts_string`, the reference's exact payload format;
    ``ts_tz_aware`` adds its ``+HH:MM`` suffix for feeds the
    reference parses with ``%z``. The default stays ``"engine"`` as a
    documented divergence: both conventions round-trip through this
    engine's own readers, and the registered oracles pin the engine
    form — the knob exists for byte-level consumers of the
    reference's emitted strings.
    """
    if ts_format not in ("engine", "pandas"):
        raise ValueError(f"unknown ts_format: {ts_format!r}")
    m = (
        readings_col
        if readings_col is not None
        else readings_map(df, value_cols, exclude=(ts_col,))
    )
    if metadata is not None:
        m = F.map_concat(
            m, F.create_map(F.lit(metadata_key), F.lit(metadata))
        )
    ts = qcol(ts_col)
    if ts_format == "pandas" and isinstance(
        df.schema[ts_col].dataType, T.TimestampType
    ):
        ts = pandas_ts_string(ts, tz_aware=ts_tz_aware)
    else:
        ts = ts.cast("string")
    return df.select(
        F.lit(asset).alias("asset"),
        ts.alias("timestamp"),
        m.alias("readings"),
    )


def explode_envelope(env: DataFrame) -> DataFrame:
    """Flatten the readings map to (asset, timestamp, datapoint, value)
    rows — the hashable projection used by the correctness oracle."""
    return env.select(
        "asset",
        "timestamp",
        F.explode(F.col("readings")).alias("datapoint", "value"),
    )
