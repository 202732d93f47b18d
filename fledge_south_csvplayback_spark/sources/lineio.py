"""Positional line access over text files — fully JVM-side.

The reference's pandas reader exposes positional semantics (``skiprows``,
``header=<row index>``, per-row order for timestamp synthesis,
reference csvplayback.py:579-597,651-659) that Spark's CSV source does
not. These helpers recover file position without shipping rows through
Python (no RDD lambdas, no ``zipWithIndex``):

- ``read_lines``: ``spark.read.text`` plus two ordering columns — the
  split's byte offset (``_metadata.file_block_start``) and
  ``monotonically_increasing_id()``. Within one split rows are read
  sequentially, so ``(_blk, _mid)`` sorts to exact file order no matter
  how Spark schedules the splits. Stays valid for compressed (.gz/.bz2)
  files, which are single-split.
- ``skip_lines``: drops the first K physical lines by filtering on the
  K-th smallest ``(_blk, _mid)`` — a TakeOrdered job over 2 long
  columns (no data movement), then a pushed-down comparison filter.
- ``with_line_numbers``: exact 0-based global line ids via the
  partition-offset technique: per-split counts (tiny aggregate,
  collected) → cumulative offsets → per-split ``row_number``. Both the
  window and the count are partitioned by split, so nothing ever
  funnels through a single partition; this is the scalable DataFrame
  equivalent of ``zipWithIndex`` (two passes over the scan, like
  zipWithIndex itself, but JVM-side and whole-stage-codegen'd).
- ``parse_csv_lines``: JVM CSV parsing of a line column via
  ``from_csv`` (quote/escape aware — the same uniVocity parser the
  native reader uses).

Caveat (shared with the reference's line-oriented shape for sensor
CSVs): embedded newlines inside quoted fields split lines here;
``spark.read.csv`` multiLine mode is the escape hatch when that matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ORDER_COLS = ("_blk", "_mid")


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """Text read with deterministic file-order columns (_blk, _mid, value).

    A UTF-8 BOM on the file's FIRST physical line is stripped — pandas
    and Spark's native CSV reader both do, so the line-oriented paths
    must too (round-12 hostile-CSV sweep). ``_blk == 0 & _mid == 0``
    identifies that line: the split at byte offset 0 is scheduled as
    partition 0, whose ids start at 0. (For a multi-file directory read
    only the first file's BOM is stripped; the skip/ragged paths read
    one file, like the reference's playback.)
    """
    df = spark.read.text(path).select(
        F.col("_metadata.file_block_start").alias("_blk"),
        F.monotonically_increasing_id().alias("_mid"),
        "value",
    )
    first = (F.col("_blk") == 0) & (F.col("_mid") == 0)
    return df.withColumn(
        "value",
        F.when(first, F.regexp_replace("value", "^\\uFEFF", "")).otherwise(
            F.col("value")
        ),
    )


# what counts as a BLANK line differs between pandas' two parsers
# (round-14 probe, both pinned live against pandas 2.2):
#   - the C engine (every pick_from_file/explicit read inherits it)
#     skips only lines made of SPACES and TABS — \x0b, \f, \xa0 and
#     unicode spaces are DATA rows;
#   - the python engine (the reference's ragged read) removes a
#     single-field line whose str.strip() is empty — i.e. ANY unicode
#     whitespace. (?U) gives Java \s the Unicode White_Space class;
#     \x1c-\x1f are appended because Python's str.isspace() counts the
#     file/group/record/unit separators as whitespace while Unicode
#     White_Space does not.
_BLANK_RE = {"c": r"^[ \t]*$", "python": r"(?U)^[\s\x1c-\x1f]*$"}


def drop_blank_lines(lines: DataFrame, engine: str = "c") -> DataFrame:
    """Blank physical lines are no rows at all.

    pandas' default ``skip_blank_lines=True`` (which the reference
    inherits for every read) makes blank lines invisible to ``header=``
    indexing and to the data itself, while ``skiprows`` still counts
    them physically — so callers apply this AFTER ``skip_lines``.

    "Blank" includes WHITESPACE-ONLY lines, with the whitespace set
    depending on which pandas parser the caller mirrors (``engine``,
    see ``_BLANK_RE``): space/tab for the C engine's reads, any
    unicode whitespace for the python engine's ragged read. Previous
    rounds used Java's ASCII ``\\s`` for both — wrong in BOTH
    directions (it dropped \\x0b/\\f lines the C engine keeps as data,
    and kept \\xa0/\\u3000 lines the python engine removes). The test
    is on the RAW line, so a QUOTED whitespace field (``"  "``) is
    data, kept.
    """
    return lines.filter(~F.col("value").rlike(_BLANK_RE[engine]))


def head_lines(spark: SparkSession, path: str, n: int) -> list[str]:
    """First n physical lines, driver-side.

    Fast path: CollectLimit over the FIRST split only (filter on
    ``_blk == 0``) — CollectLimit executes partitions in index order
    and stops as soon as n rows arrive, so a header/sample read touches
    one split, not the whole file (``orderBy.limit`` plans as
    TakeOrdered, where EVERY task scans its full split to offer its
    top-n). The ≤n collected rows are re-sorted by ``_mid`` driver-side
    so no assumption about row arrival order remains. Falls back to
    the full TakeOrdered only when the first split yields fewer than n
    lines (a tiny file is single-split, so in practice only when one
    physical line exceeds the split size — or the file really has
    fewer than n lines, where the fallback re-reads just that file)."""
    first = read_lines(spark, path).filter(F.col("_blk") == 0).limit(n).collect()
    if len(first) >= n:
        return [r.value for r in sorted(first, key=lambda r: r._mid)]
    rows = read_lines(spark, path).orderBy(*ORDER_COLS).limit(n).collect()
    return [r.value for r in rows]


def skip_lines(lines: DataFrame, k: int) -> DataFrame:
    """Drop the first k physical lines of a ``read_lines`` frame."""
    if k <= 0:
        return lines
    bound = lines.select(*ORDER_COLS).orderBy(*ORDER_COLS).limit(k).collect()
    if len(bound) < k:  # fewer than k lines: nothing left
        return lines.filter(F.lit(False))
    blk, mid = bound[-1]
    return lines.filter(
        (F.col("_blk") > blk) | ((F.col("_blk") == blk) & (F.col("_mid") > mid))
    )


def with_line_numbers(lines: DataFrame, col_name: str = "row_id") -> DataFrame:
    """Exact 0-based global line ids in file order, distributed.

    Split-local ``row_number`` + driver-collected per-split offsets;
    each window is bounded by one file split, so no global sort and no
    single-partition funnel (SURVEY.md §7 'what's hard' #1 done right).
    """
    w = Window.partitionBy("_blk").orderBy("_mid")
    counts = sorted(
        (r._blk, r.cnt)
        for r in lines.groupBy("_blk").agg(F.count("*").alias("cnt")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for blk, cnt in counts:
        offsets[blk] = acc
        acc += cnt
    if not offsets:
        return lines.withColumn(col_name, F.lit(0).cast("long")).filter(F.lit(False))
    offset_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    return lines.withColumn(
        col_name,
        (offset_map[F.col("_blk")] + F.row_number().over(w) - 1).cast("long"),
    )


def parse_csv_lines(
    lines: DataFrame,
    schema: str,
    keep: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Parse the ``value`` line column as CSV with a pinned schema (DDL).

    JVM-side (``from_csv``), single pass, quote-aware. ``keep`` carries
    extra columns (e.g. row_id) through the parse. RFC4180
    doubled-quote escaping is the default (pandas/DuckDB behavior — the
    reference's CSVs are pandas-written); Spark's backslash default is
    overridable via ``options``.
    """
    opts = {"escape": '"', **(options or {})}
    parsed: Column = F.from_csv(F.col("value"), schema, opts)
    keep_cols = [F.col(c) for c in (keep or [])]
    return lines.select(*keep_cols, parsed.alias("_r")).select(
        *(keep or []), "_r.*"
    )
