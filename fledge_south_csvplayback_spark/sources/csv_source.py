"""CSV scan variants (SURVEY.md §2.1 S3-S6, §1.4).

The reference reads CSVs through chunked pandas iterators with four
variants — ragged, explicit schema, header-at-index, each ± skiprows
(reference csvplayback.py:556-673). Here each variant is a batch
DataFrame builder; the streaming playback layer wraps the same
builders (chunking is Structured Streaming's job, not the reader's).

Scale notes:

- Plain reads go through ``spark.read.csv`` — distributed splits,
  codec handling (.gz/.bz2 native), pushdown-friendly.
- ``skip_rows`` / ``header at index k`` has no native Spark CSV
  option; those paths use :mod:`lineio` — a text scan ordered by
  ``(_metadata.file_block_start, monotonically_increasing_id)`` with
  the first K physical lines filtered out and ``from_csv`` doing the
  parse. Everything stays in the JVM / whole-stage codegen; no Python
  RDD lambdas anywhere (plans show no ExistingRDD/PythonRDD node).
- Schemas are always pinned at parse time (caller-supplied, or
  inferred once driver-side from a head sample) — a single pass,
  never ``inferSchema=True`` stacked under casts.
- Header/metadata lines are fetched with a first-split CollectLimit
  K-line read (full-file TakeOrdered only as the short-split
  fallback) — driver-side K lines that read one split, not the file.

Embedded newlines inside quoted fields are not supported in the
skip-rows paths (line-oriented); the reference's pandas reader had the
same practical shape for sensor CSVs.
"""

from __future__ import annotations

import csv
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fledge_south_csvplayback_spark.schema import ColumnSpec, parse_use_columns
from fledge_south_csvplayback_spark.sources import lineio

# reference csvplayback.py:510 matches '.csv'-rooted suffixes only
CSV_EXTENSIONS = (".csv", ".csv.bz2", ".csv.gz")


def check_not_empty(path: str) -> None:
    """Zero-length-file guard (S6, csvplayback.py:566-568)."""
    if os.path.isfile(path) and os.path.getsize(path) == 0:
        raise EOFError(f"CSV file {path} has zero length")


# ---------------------------------------------------------------------------
# S1/S2: file discovery (batch equivalent of the FileFinder thread,
# csvplayback.py:477-517 — substring match on basename + csv extension,
# alphabetical order, pick-first)
# ---------------------------------------------------------------------------
def find_csv_files(csv_dir: str, pattern: str = "") -> list[str]:
    if not os.path.exists(csv_dir):
        raise FileNotFoundError(csv_dir)
    names = sorted(os.listdir(csv_dir))
    return [
        os.path.join(csv_dir, n)
        for n in names
        if pattern in n and n.endswith(CSV_EXTENSIONS)
    ]


def find_csv_file(csv_dir: str, pattern: str = "") -> str | None:
    files = find_csv_files(csv_dir, pattern)
    return files[0] if files else None


# ---------------------------------------------------------------------------
# raw line access (delegates to lineio; kept as the module's public API)
# ---------------------------------------------------------------------------
def head_lines(spark: SparkSession, path: str, n: int) -> list[str]:
    """First n physical lines (driver-side; first-split CollectLimit,
    see ``lineio.head_lines`` for the fallback contract)."""
    return lineio.head_lines(spark, path, n)


def _split_header(line: str) -> list[str]:
    """Parse one header line with the csv module (quote-aware)."""
    return next(csv.reader([line]))


_INFER_ORDER: tuple[tuple[str, type], ...] = (("bigint", int), ("double", float))
# driver-side inference sample: data lines examined from the head read.
# 128 lines is still one tiny driver-side read (the head scan touches
# only the file's first split) while covering 8x the type-widening
# window of the original 16 — the sample-based contract below is
# unchanged, just harder to fall afoul of.
INFER_SAMPLE_LINES = 128


def _infer_ddl(names: list[str], sample_rows: list[list[str]]) -> str:
    """Driver-side type inference over the head sample (int → float →
    string, widened per column across the sampled rows).

    Mirrors the practical outcome of the reference's per-chunk pandas
    inference for sensor CSVs without a second distributed pass. The
    contract is SAMPLE-based: a column whose later rows widen beyond
    the sampled type (e.g. ints for 16 rows, then '2.5') parses those
    rows to NULL — the same silent-cast semantics as the non-fast
    line-oriented path — so feeds with untrusted-width columns should
    pass an explicit ``schema=`` (or ``infer_schema=False`` for
    all-string). The reference has the same wobble per 4000-row chunk
    (csvplayback.py:679-691: dtype flips between chunks).

    Empty cells are NO EVIDENCE, not string evidence (Spark's own
    inference and pandas treat them as missing): a sparse sensor gap
    in the sample must not flip a numeric column to all-string. A
    column with no non-empty sample cell stays string.
    """
    ranks = {"bigint": 0, "double": 1, "string": 2}

    def cell_type(v: str) -> str:
        for ddl, py in _INFER_ORDER:
            try:
                py(v)
                return ddl
            except (TypeError, ValueError):
                continue
        return "string"

    types = ["bigint"] * len(names)
    seen = [False] * len(names)
    for row in sample_rows:
        for i, v in enumerate(row[: len(names)]):
            if v == "":
                continue
            seen[i] = True
            t = cell_type(v)
            if ranks[t] > ranks[types[i]]:
                types[i] = t
    types = [t if s else "string" for t, s in zip(types, seen)]
    return ", ".join(f"`{n}` {t}" for n, t in zip(names, types))


def _schema_ddl(schema: T.StructType | str, names: list[str] | None = None) -> str:
    """Normalize a StructType/DDL schema to DDL, optionally renaming."""
    if isinstance(schema, T.StructType):
        st = schema
    else:
        st = T.StructType.fromDDL(schema)
    if names is not None:
        if len(names) != len(st.fields):
            raise ValueError(
                f"schema has {len(st.fields)} fields but header has "
                f"{len(names)} columns"
            )
        st = T.StructType(
            [T.StructField(n, f.dataType, f.nullable) for n, f in zip(names, st.fields)]
        )
    return ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in st.fields)


# ---------------------------------------------------------------------------
# S3 variant 1: pick_from_file — header names from row index H after
# skipping S rows (csvplayback.py:651-659; pandas header=H, skiprows=S:
# drop S lines, line S+H is the header, data starts at S+H+1)
# ---------------------------------------------------------------------------
def read_pick_from_file(
    spark: SparkSession,
    path: str,
    header_row: int = 0,
    skip_rows: int = 0,
    schema: T.StructType | str | None = None,
    infer_schema: bool = True,
) -> DataFrame:
    check_not_empty(path)
    if header_row == 0 and skip_rows == 0:
        # fast path: fully native reader, splittable, pushdown-friendly;
        # RFC4180 doubled-quote escaping (pandas-written CSVs). The
        # schema is pinned: caller-supplied, inferred once driver-side
        # from a first-split head sample, or (infer_schema=False) left
        # to the native reader's all-string default with NO extra job —
        # never inferSchema=True, whose inference is a full second
        # distributed pass over the data.
        reader = spark.read.option("header", True).option("escape", '"')
        if schema is not None:
            return reader.schema(schema).csv(path)
        if not infer_schema:
            return reader.csv(path)
        head = head_lines(spark, path, 1 + INFER_SAMPLE_LINES)
        names = _split_header(head[0])
        sample = list(csv.reader(head[1:]))
        return reader.schema(_infer_ddl(names, sample)).csv(path)

    n_sample = INFER_SAMPLE_LINES if (schema is None and infer_schema) else 1
    head = head_lines(spark, path, skip_rows + header_row + 1 + n_sample)
    names = _split_header(head[skip_rows + header_row])
    if schema is not None:
        ddl = _schema_ddl(schema, names)
    else:
        sample = list(csv.reader(head[skip_rows + header_row + 1 :]))
        ddl = _infer_ddl(names, sample if infer_schema else [])
    data = lineio.skip_lines(
        lineio.read_lines(spark, path), skip_rows + header_row + 1
    )
    return lineio.parse_csv_lines(data, ddl)


# ---------------------------------------------------------------------------
# S3 variant 2: explicit — useColumns does rename+select+cast at once
# (csvplayback.py:601-649; pandas header=0 + names=: the first data line
# after the skip is a discarded header, spec names apply positionally)
# ---------------------------------------------------------------------------
def read_explicit(
    spark: SparkSession,
    path: str,
    use_columns: str | list[ColumnSpec],
    skip_rows: int = 0,
) -> DataFrame:
    check_not_empty(path)
    specs = (
        parse_use_columns(use_columns) if isinstance(use_columns, str) else use_columns
    )
    header_line = head_lines(spark, path, skip_rows + 1)[-1]
    n_cols = len(_split_header(header_line))
    if len(specs) != n_cols:
        raise ValueError(
            f"useColumns has {len(specs)} entries but file has {n_cols} columns"
        )
    raw_ddl = ", ".join(f"`_c{i}` string" for i in range(n_cols))

    if skip_rows == 0:
        # native fast path: header=True discards line 0, pinned all-string
        # schema applies positionally — one pass, no inference
        df = (
            spark.read.option("header", True)
            .option("escape", '"')
            .schema(raw_ddl)
            .csv(path)
        )
    else:
        data = lineio.skip_lines(lineio.read_lines(spark, path), skip_rows + 1)
        df = lineio.parse_csv_lines(data, raw_ddl)

    cols = []
    for i, spec in enumerate(specs):
        if spec.name == "":
            continue  # positional drop (usecols semantics)
        c = F.col(f"_c{i}")
        if spec.dtype is not None:
            c = c.cast(spec.dtype)
        cols.append(c.alias(spec.name))
    return df.select(*cols)


# ---------------------------------------------------------------------------
# S3 variant 3: ragged / dynamic columns (csvplayback.py:587-597,703-711;
# docs/index.rst:52-67) — every row may have a different field count;
# non-empty position i becomes map key "<prefix>_<i+1>".
# ---------------------------------------------------------------------------
def read_ragged(
    spark: SparkSession,
    path: str,
    prefix: str = "column",
    skip_rows: int = 0,
) -> DataFrame:
    """Returns (row_id long, readings map<string,string>).

    Values stay strings (the reference's pandas read gives per-column
    object dtypes for ragged input; a string map is the honest Spark
    shape). row_id preserves file order for downstream timestamping;
    it comes from the distributed partition-offset numbering in lineio
    (no global sort, no Python round-trip).
    """
    check_not_empty(path)
    lines = lineio.with_line_numbers(
        lineio.skip_lines(lineio.read_lines(spark, path), skip_rows)
    )
    fields = F.split(F.col("value"), ",")
    entry = F.transform(
        fields,
        lambda v, i: F.struct(
            F.concat(F.lit(prefix + "_"), (i + 1).cast("string")).alias("key"),
            v.alias("value"),
        ),
    )
    kept = F.filter(entry, lambda s: s["value"].isNotNull() & (s["value"] != ""))
    return lines.select("row_id", F.map_from_entries(kept).alias("readings"))


# ---------------------------------------------------------------------------
# S5: pass_in_datapoint — first n raw lines joined with "_"
# (csvplayback.py:661-671); merged into every reading by the envelope
# builder (operators/readings.py).
# ---------------------------------------------------------------------------
def read_metadata_datapoint(spark: SparkSession, path: str, n_rows: int) -> str:
    return "_".join(head_lines(spark, path, n_rows))
