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
    partition 0, whose ids start at 0. SINGLE-file only: across a
    directory, (_blk, _mid) does not order (every file has a _blk==0
    split) — directory callers use the per-file helpers below
    (round 15).
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


# ---------------------------------------------------------------------------
# per-FILE positional access for DIRECTORY reads (round 15)
#
# The single-file helpers above order by (_blk, _mid); across a
# directory that collapses — every file has a _blk==0 split, and _mid
# reflects partition SCHEDULING order across files — so a global
# skip/number over a directory-wide read_lines was nondeterministic
# silent corruption (the round-15 hunt's finding: a directory +
# skip_rows read leaked other files' preamble and header lines in as
# data). Directory semantics are PER FILE, like the reference's
# one-file-at-a-time playback and pandas' per-file read+concat: each
# file is skipped/headed/numbered on its own, in alphabetical file
# order. The machinery stays collect-light and shuffle-free over the
# data: one tiny per-(file, split) aggregate (map-side combined, one
# row per split), driver-side cut arithmetic, and a broadcast literal
# map filter — never a whole-file window, never a data shuffle.
# ---------------------------------------------------------------------------

# Per-file cut/offset maps are literal create_map expressions, so the
# number of files in one line-oriented directory read is bounded to
# keep the expression tree sane. Past this, use the native
# schema-pinned path (unbounded) or stream files individually.
DIR_MAX_FILES = 4096

_BOM_RE = "^\\uFEFF"


def read_lines_by_file(spark: SparkSession, path: str) -> DataFrame:
    """Text read tagged with the source file: (_file, _blk, _mid, value).

    Within one (file, split), ``_mid`` is sequential (rows of a
    PartitionedFile are read in order, and monotonically_increasing_id
    increments per row within the task), so (_file, _blk, _mid) sorts
    to exact per-file line order regardless of split packing or
    scheduling. No BOM strip here — per-file first-line identification
    needs the extents aggregate, so callers strip via
    ``strip_bom_by_file`` (data paths) or driver-side (head paths)."""
    return spark.read.text(path).select(
        F.input_file_name().alias("_file"),
        F.col("_metadata.file_block_start").alias("_blk"),
        F.monotonically_increasing_id().alias("_mid"),
        "value",
    )


def file_extents(lines: DataFrame) -> list[tuple[str, int, int, int]]:
    """One tiny aggregate over a ``read_lines_by_file`` frame: per file
    (sorted by URI — alphabetical within one directory), ``(file,
    first_mid, first_split_lines, max_blk)``. Map-side combined; one
    output row per file. Zero-byte files produce no text rows and are
    absent (the native directory reader skips them identically)."""
    rows = (
        lines.groupBy("_file")
        .agg(
            F.min(F.when(F.col("_blk") == 0, F.col("_mid"))).alias("m0"),
            F.count(F.when(F.col("_blk") == 0, 1)).alias("n0"),
            F.max("_blk").alias("maxblk"),
        )
        .collect()
    )
    if len(rows) > DIR_MAX_FILES:
        raise ValueError(
            f"directory read spans {len(rows)} files (max {DIR_MAX_FILES} "
            "for per-file line-oriented semantics) — use the native "
            "schema-pinned path or stream files individually"
        )
    return sorted((r["_file"], r["m0"], r["n0"], r["maxblk"]) for r in rows)


def _file_map(pairs: dict[str, int]) -> Column:
    """Literal map expression: file URI -> long."""
    return F.create_map(
        *[x for f, v in pairs.items() for x in (F.lit(f), F.lit(v))]
    )


def heads_by_file(
    lines: DataFrame,
    extents: list[tuple[str, int, int, int]],
    want: dict[str, int],
) -> dict[str, list[str]]:
    """First ``want[file]`` physical lines of each file, driver-side,
    in ONE job: filter ``_blk == 0 & _mid < first_mid + want`` through
    a broadcast literal map (within a split, _mid is dense — row j of
    the split is first_mid + j), collect, group and sort per file. A
    UTF-8 BOM on each file's first physical line is stripped (pandas
    strips per file; the directory head is parsed per file too).

    A file whose first split holds fewer lines than wanted is complete
    (n0 < want and max_blk == 0 means EOF) — except the monster-line
    corner where the file has MORE splits (max_blk > 0): one physical
    line larger than a split. Those fall back to a per-file
    ``head_lines`` (full-order TakeOrdered on that file alone)."""
    import re as _re

    bounds = {f: m0 + want[f] for f, m0, _n0, _mb in extents if f in want}
    if not bounds:
        return {}
    bound_map = _file_map(bounds)
    got = (
        lines.filter(
            (F.col("_blk") == 0) & (F.col("_mid") < bound_map[F.col("_file")])
        )
        .select("_file", "_mid", "value")
        .collect()
    )
    heads: dict[str, list[str]] = {f: [] for f in bounds}
    for r in sorted(got, key=lambda r: (r["_file"], r["_mid"])):
        heads[r["_file"]].append(r["value"])
    by_file = {f: (m0, n0, mb) for f, m0, n0, mb in extents}
    for f in heads:
        _m0, n0, maxblk = by_file[f]
        if maxblk > 0 and len(heads[f]) < want[f] and n0 <= len(heads[f]):
            # monster-line corner: first split exhausted but the file
            # continues — re-read this one file in full order
            heads[f] = head_lines(lines.sparkSession, f, want[f])
        if heads[f]:
            heads[f][0] = _re.sub(_BOM_RE, "", heads[f][0])
    return heads


def strip_bom_by_file(
    lines: DataFrame, first_mids: dict[str, int]
) -> DataFrame:
    """Strip a UTF-8 BOM from each file's FIRST physical line (pandas
    strips per file; the single-file ``read_lines`` only handles the
    one file it reads). ``first_mids``: file -> _mid of its first
    line."""
    if not first_mids:
        return lines
    m0 = _file_map(first_mids)
    first = (F.col("_blk") == 0) & (F.col("_mid") == m0[F.col("_file")])
    return lines.withColumn(
        "value",
        F.when(first, F.regexp_replace("value", _BOM_RE, "")).otherwise(
            F.col("value")
        ),
    )


def skip_lines_by_file(lines: DataFrame, cut_mids: dict[str, int]) -> DataFrame:
    """Per-file positional cut: keep rows strictly AFTER each file's
    cut line, where ``cut_mids[file]`` is the _mid of the last dropped
    line (all cuts lie in the file's FIRST split — they come from the
    bounded head probe — so every ``_blk > 0`` row survives by
    construction). Files absent from the map are dropped entirely
    (e.g. a file whose lines are all consumed by skip+header)."""
    if not cut_mids:
        return lines.filter(F.lit(False))
    cut = _file_map(cut_mids)
    in_map = cut[F.col("_file")].isNotNull()
    return lines.filter(
        in_map & ((F.col("_blk") > 0) | (F.col("_mid") > cut[F.col("_file")]))
    )


def with_line_numbers_by_file(
    lines: DataFrame, col_name: str = "row_id"
) -> DataFrame:
    """Exact 0-based global line ids over a directory read, ordered by
    (file URI, within-file position) — alphabetical file order within
    one directory, the reference's playback order. Same partition-
    offset technique as ``with_line_numbers``: windows are bounded per
    (file, split), offsets are a driver-collected tiny aggregate, no
    global sort, no whole-file funnel."""
    w = Window.partitionBy("_file", "_blk").orderBy("_mid")
    counts = sorted(
        ((r["_file"], r["_blk"]), r["cnt"])
        for r in lines.groupBy("_file", "_blk")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    offsets: dict[tuple[str, int], int] = {}
    acc = 0
    for key, cnt in counts:
        offsets[key] = acc
        acc += cnt
    if not offsets:
        return lines.withColumn(col_name, F.lit(0).cast("long")).filter(
            F.lit(False)
        )
    key_expr = F.concat_ws(" ", F.col("_file"), F.col("_blk").cast("string"))
    offset_map = F.create_map(
        *[
            x
            for (f, b), off in offsets.items()
            for x in (F.lit(f + " " + str(b)), F.lit(off))
        ]
    )
    return lines.withColumn(
        col_name,
        (offset_map[key_expr] + F.row_number().over(w) - 1).cast("long"),
    )
