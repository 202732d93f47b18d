"""Timestamp synthesis T1-T5 — the reference's signature computation
(reference csvplayback.py:717-756; styles bound at 525-527).

Each playback row gets a timestamp from one of five styles:

- T1 ``current time`` / continuous (csvplayback.py:738-743,753-756):
  one wall-clock anchor per chunk; row *i* of a chunk of *n* rows gets
  ``anchor.replace(microsecond = i * floor(1e6 / n))`` — the chunk's
  rows spread evenly across the anchor's second.
- T2 ``current time`` / burst (csvplayback.py:747-749): every reading
  in a burst carries the same wall-clock stamp.
- T3 ``copy csv value`` (csvplayback.py:717-721): parse ``ts_col``
  with a strptime format; source column kept.
- T4 ``move csv value`` (csvplayback.py:723-725): T3 then drop the
  source column.
- T5 ``use csv sample delta`` (csvplayback.py:726-736): delta = the
  difference of the *first two* timestamps ever seen; row *k* of the
  whole playback gets ``anchor + k * delta`` (the reference's
  ``self.c`` synthetic clock, init at csvplayback.py:530).

The reference's wall-clock anchors (``datetime.now`` per chunk) are
made deterministic here by passing an explicit ``anchor`` plus a
per-chunk period: chunk *c*'s anchor is ``anchor + c * period``. That
keeps every style a pure function of (data, parameters) — exactly what
the DuckDB oracle needs — while preserving the shape of the computed
series. All arithmetic is built-in (timestampadd / date_trunc /
unix_micros); row positions come from the distributed rank in
``rowid.py``, so nothing funnels through a single partition at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fledge_south_csvplayback_spark.schema import qcol

from fledge_south_csvplayback_spark.operators.rowid import with_global_row_number

# ---------------------------------------------------------------------------
# strptime -> Spark/JDK DateTimeFormatter pattern translation (T3/T4's
# timestampFormat config, default '%Y-%m-%d %H:%M:%S.%f%z',
# csvplayback.py:198-206)
# ---------------------------------------------------------------------------
_STRPTIME_TO_JDK = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%I": "hh",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",
    # python %z accepts +HHMM, +HH:MM, and a bare Z (py3.7+); JDK 'Z'
    # takes only +HHMM, so colon offsets raised where pandas parsed
    # (round-12 sweep). The optional-section pair tries the colon form
    # (XXX) then the basic form (XX); both accept 'Z'. Parse-only —
    # this translator never feeds date_format.
    "%z": "[XXX][XX]",
    "%j": "DDD",
    "%a": "EEE",
    "%A": "EEEE",
    "%b": "MMM",
    "%B": "MMMM",
    "%p": "a",
    "%%": "%",
}


def strptime_to_jdk(fmt: str) -> str:
    """Translate a strptime format to the Spark datetime pattern dialect.

    Literal runs containing letters (pattern letters in JDK) are quoted.
    """
    out: list[str] = []
    literal: list[str] = []

    def flush() -> None:
        if not literal:
            return
        text = "".join(literal)
        if any(c.isalpha() or c == "'" for c in text):
            out.append("'" + text.replace("'", "''") + "'")
        else:
            out.append(text)
        literal.clear()

    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            if tok in _STRPTIME_TO_JDK:
                flush()
                out.append(_STRPTIME_TO_JDK[tok])
                i += 2
                continue
            raise ValueError(f"unsupported strptime directive {tok!r} in {fmt!r}")
        literal.append(fmt[i])
        i += 1
    flush()
    return "".join(out)


def _fmt_directives(fmt: str) -> set[str]:
    """The %-directives present in ``fmt`` (%% is a literal, not a
    directive) — the same scan strptime_to_jdk runs."""
    out: set[str] = set()
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            out.add(fmt[i : i + 2])
            i += 2
        else:
            i += 1
    out.discard("%%")
    return out


def parse_strptime(col, fmt: str):
    """``to_timestamp`` under the strptime dialect, with Python's %y
    CENTURY PIVOT: strptime (and so pandas, the reference's engine)
    reads two-digit years 69–99 as 19xx and 00–68 as 20xx (the POSIX
    rule), while the JDK ``yy`` field reads all hundred into
    2000–2099 — so ``'78-01-07'`` parsed a century late (round-13
    fuzz find, value-level divergence). When the format uses %y (and
    no %Y), parsed years 2069–2099 shift back 100 years; the shifted
    range 1969–1999 crosses no century leap-rule boundary, so the
    interval arithmetic is exact for every calendar date including
    Feb 29. Documented corner: with a %z offset, the shift keys on
    the UTC-normalized year, so a string within |offset| of the
    2068→2069 New Year instant can pivot differently than strptime's
    local-digits rule — hours out of a 100-year window."""
    ts = F.to_timestamp(col, strptime_to_jdk(fmt))
    d = _fmt_directives(fmt)
    if "%y" in d and "%Y" not in d:
        ts = F.when(
            F.year(ts) >= 2069, ts - F.expr("INTERVAL 100 YEARS")
        ).otherwise(ts)
    return ts


# ---------------------------------------------------------------------------
# transforms — each takes a frame and returns it with a `timestamp` column
# ---------------------------------------------------------------------------
def copy_csv_value(df: DataFrame, ts_col: str, fmt: str) -> DataFrame:
    """T3: parse ts_col as the reading timestamp; source column kept."""
    return df.withColumn("timestamp", parse_strptime(qcol(ts_col), fmt))


def move_csv_value(df: DataFrame, ts_col: str, fmt: str) -> DataFrame:
    """T4: T3, then drop the source column (is_drop_ts, csvplayback.py:723-725)."""
    return copy_csv_value(df, ts_col, fmt).drop(ts_col)


def _chunked(df: DataFrame, order_cols: list[str]) -> DataFrame:
    return with_global_row_number(df, order_cols, "_k")


def current_time_burst(
    df: DataFrame,
    order_cols: list[str],
    anchor: str,
    chunk_size: int,
    period_s: float = 1.0,
) -> DataFrame:
    """T2: chunk c (rows [c*n, (c+1)*n)) stamps every row anchor + c*period."""
    period_us = int(period_s * 1_000_000)
    return (
        _chunked(df, order_cols)
        .withColumn(
            "timestamp",
            F.expr(
                f"timestampadd(MICROSECOND, (_k div {chunk_size}) * {period_us}, "
                f"TIMESTAMP '{anchor}')"
            ),
        )
        .drop("_k")
    )


def current_time_continuous(
    df: DataFrame,
    order_cols: list[str],
    anchor: str,
    chunk_size: int,
    period_s: float = 1.0,
) -> DataFrame:
    """T1: row i of chunk c gets (anchor + c*period) with the microsecond
    field REPLACED by i * floor(1e6/n) — the reference's even spread of a
    chunk across its anchor second (csvplayback.py:753-756)."""
    step_us = 1_000_000 // chunk_size
    period_us = int(period_s * 1_000_000)
    return (
        _chunked(df, order_cols)
        .withColumn(
            "timestamp",
            F.expr(
                "timestampadd(MICROSECOND, "
                f"(_k % {chunk_size}) * {step_us}, "
                f"date_trunc('second', timestampadd(MICROSECOND, "
                f"(_k div {chunk_size}) * {period_us}, TIMESTAMP '{anchor}')))"
            ),
        )
        .drop("_k")
    )


def sample_delta(
    df: DataFrame,
    order_cols: list[str],
    ts_col: str,
    fmt: str,
    anchor: str,
) -> DataFrame:
    """T5: delta = parsed ts[1] - ts[0]; row k gets anchor + k*delta.

    The two-row delta is a TakeOrdered(2) + 1-row aggregate broadcast
    back onto the frame — no driver collect in the data path, no
    single-partition window.
    """
    numbered = _chunked(df, order_cols)
    first_two = (
        numbered.orderBy("_k")
        .limit(2)
        .select(F.unix_micros(parse_strptime(qcol(ts_col), fmt)).alias("_us"), "_k")
    )
    delta = first_two.agg(
        (F.max_by("_us", "_k") - F.min_by("_us", "_k")).alias("_delta_us")
    )
    return (
        numbered.join(F.broadcast(delta))
        .withColumn(
            "timestamp",
            F.expr(f"timestampadd(MICROSECOND, _k * _delta_us, TIMESTAMP '{anchor}')"),
        )
        .drop("_k", "_delta_us")
    )
