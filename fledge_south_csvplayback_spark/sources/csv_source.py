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
  option; those paths read lines with ``sc.textFile`` and drop the
  first K *physical* lines via ``zipWithIndex`` — one extra pass, but
  exact, distributed, and only used when the config demands it. This
  is per-file logic (the reference plays one file at a time, S1/S9);
  the multi-file batch path keeps the fast native reader.
- Header/metadata lines are fetched with a ``limit(K)`` text read —
  a driver-side K-line read regardless of file size.

Embedded newlines inside quoted fields are not supported in the
skip-rows paths (line-oriented); the reference's pandas reader had the
same practical shape for sensor CSVs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fledge_south_csvplayback_spark.schema import ColumnSpec, parse_use_columns

CSV_EXTENSIONS = (".csv", "csv.bz2", "csv.gz")  # csvplayback.py:510


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
# raw line access helpers
# ---------------------------------------------------------------------------
def head_lines(spark: SparkSession, path: str, n: int) -> list[str]:
    """First n physical lines (driver-side; limit is pushed into the scan)."""
    return [r.value for r in spark.read.text(path).limit(n).collect()]


def _lines_dropping(spark: SparkSession, path: str, k: int):
    """RDD of lines with the first k physical lines removed.

    zipWithIndex is the one genuinely positional-imperative piece of
    the engine (SURVEY.md §7 'what's hard' #1): CSV rows carry no
    position, and pandas-style skiprows is positional by definition.
    """
    rdd = spark.sparkContext.textFile(path)
    if k <= 0:
        return rdd
    return rdd.zipWithIndex().filter(lambda x: x[1] >= k).map(lambda x: x[0])


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
    schema: T.StructType | None = None,
    infer_schema: bool = True,
) -> DataFrame:
    check_not_empty(path)
    if header_row == 0 and skip_rows == 0:
        # fast path: fully native reader
        reader = spark.read.option("header", True)
        if schema is not None:
            return reader.schema(schema).csv(path)
        return reader.option("inferSchema", infer_schema).csv(path)

    names_line = head_lines(spark, path, skip_rows + header_row + 1)[-1]
    names = names_line.split(",")
    data = _lines_dropping(spark, path, skip_rows + header_row + 1)
    reader = spark.read
    if schema is not None:
        df = reader.schema(schema).csv(data)
    else:
        df = reader.option("inferSchema", infer_schema).csv(data)
    return df.toDF(*names)


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
    data = _lines_dropping(spark, path, skip_rows + 1)  # +1: header line discarded
    df = spark.read.option("inferSchema", True).csv(data)

    if len(specs) != len(df.columns):
        raise ValueError(
            f"useColumns has {len(specs)} entries but file has "
            f"{len(df.columns)} columns"
        )
    cols = []
    for spec, src in zip(specs, df.columns):
        if spec.name == "":
            continue  # positional drop (usecols semantics)
        c = F.col(src)
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
    shape). row_id preserves file order for downstream timestamping.
    """
    check_not_empty(path)
    lines = _lines_dropping(spark, path, skip_rows).zipWithIndex()
    df = spark.createDataFrame(
        lines.map(lambda x: (x[1], x[0])), schema="row_id long, line string"
    )
    fields = F.split(F.col("line"), ",")
    entry = F.transform(
        fields,
        lambda v, i: F.struct(
            F.concat(F.lit(prefix + "_"), (i + 1).cast("string")).alias("key"),
            v.alias("value"),
        ),
    )
    kept = F.filter(entry, lambda s: s["value"].isNotNull() & (s["value"] != ""))
    return df.select("row_id", F.map_from_entries(kept).alias("readings"))


# ---------------------------------------------------------------------------
# S5: pass_in_datapoint — first n raw lines joined with "_"
# (csvplayback.py:661-671); merged into every reading by the envelope
# builder (operators/readings.py).
# ---------------------------------------------------------------------------
def read_metadata_datapoint(spark: SparkSession, path: str, n_rows: int) -> str:
    return "_".join(head_lines(spark, path, n_rows))
