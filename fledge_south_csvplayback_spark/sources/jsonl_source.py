"""JSONL (newline-delimited JSON) document source — the standard
interchange format for LLM training corpora (one document object per
line; what CommonCrawl-derived releases like C4/RefinedWeb/Dolma ship).

An engine extension, not reference surface (the reference is a CSV
plugin; see SURVEY §2 ABSENT annotations): a user pointing this engine
at a real corpus gets a first-class reader with the same design rules
as the CSV layer —

- **schema is always pinned**: callers pass the document schema (or
  use :data:`DOCUMENTS_SCHEMA`); ``inferSchema``-style sampling over
  100 TB of JSONL is a full extra pass and is deliberately not
  offered. Extra keys in the JSON are simply not materialized
  (column pruning reaches the scan's ReadSchema).
- **codecs are native**: ``.gz``/``.bz2``/``.zst`` files decode in the
  scan like the CSV paths (per-file splits for non-splittable codecs —
  the standard many-files-per-shard corpus layout parallelizes by
  file count, which is exactly how these corpora are published).
- **malformed lines are an audit trail, not a crash**: PERMISSIVE
  parsing keeps corrupt lines in ``_corrupt_record`` (select it via
  ``keep_corrupt=True``) so a curation pipeline can count/quarantine
  them; ``mode="FAILFAST"`` is the strict knob.

``write_jsonl`` is the matching sink (one JSON object per line,
optionally compressed) so curated corpora round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the documents-table schema as JSONL (matches the parquet fixtures)
DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
_CORRUPT = "_corrupt_record"
_BOM = "\ufeff"


def read_jsonl_documents(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_SCHEMA,
    mode: str = "PERMISSIVE",
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read a JSONL corpus with a pinned schema.

    ``keep_corrupt=True`` appends the ``_corrupt_record`` column
    (NULL for clean rows, the raw line for malformed ones) — the
    quarantine pattern: a malformed line yields NULLs in every data
    column plus the original text for audit. With the default
    ``keep_corrupt=False`` the corrupt column is dropped and
    malformed lines surface as all-NULL rows under PERMISSIVE or an
    error under FAILFAST.

    Hostile-input semantics (pinned by ``tests/test_hostile_jsonl.py``,
    the round-12 sweep of this source's fixture envelope):

    - unparseable JSON / non-object lines: every data column NULL,
      raw line in the corrupt column;
    - a TYPE-MISMATCHED field (string where long is declared, float
      for long, integer overflow): that field NULL, the other fields
      KEPT, and the corrupt column still carries the raw line — a
      partial row plus the audit trail;
    - a JSON object/array where a string column is declared is
      STRINGIFIED (not corrupt) — Jackson's lenient string coercion;
    - duplicate keys: last occurrence wins (not corrupt);
    - missing fields / extra keys: NULL / ignored (not corrupt);
    - blank lines are no rows at all; exactly ONE leading UTF-8 BOM
      per RECORD is tolerated (Jackson's byte-source bootstrapper
      skips it) — so the cat-of-BOM'd-shards shape parses clean, a
      double BOM or a BOM after whitespace is corrupt, a record of
      just a BOM is corrupt, and BOM + space/tab-only is no row
      (round-15 cells, pinned with the report's matching
      classification in tests/test_hostile_jsonl.py).
    """
    full = f"{schema}, {_CORRUPT} string"
    reader = (
        spark.read.schema(full)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", _CORRUPT)
    )
    df = reader.json(path)
    return df if keep_corrupt else df.drop(_CORRUPT)


def jsonl_corrupt_report(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_SCHEMA,
    by_file: bool = False,
) -> DataFrame:
    """One row: (n_rows, n_corrupt) — the ingest health check a
    pipeline logs before accepting a shard batch. With
    ``by_file=True``, one row PER SHARD: (file, n_rows, n_corrupt),
    the actionable form at corpus scale — a bad export job corrupts
    whole shards, and quarantining needs the file name, not a global
    count. Same scan, same classification; the group-by key is
    ``input_file_name()`` (exchange payload = one row per shard).

    Built on a text scan + ``from_json`` rather than the JSON reader:
    Spark disallows queries that reference ONLY ``_corrupt_record``
    over a raw JSON source (the pruned plan would re-parse just to
    find failures — QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the
    documented cache() workaround is exactly wrong at corpus scale.
    The text-scan formulation is one pass, no cache, same parser."""
    # The native reader tolerates exactly ONE leading UTF-8 BOM per
    # RECORD (Jackson's byte-source bootstrapper sniffs and skips it
    # before parsing) — the cat-of-BOM'd-shards shape: a mid-file line
    # '<BOM>{...}' is a CLEAN row. from_json gets a decoded string
    # (no byte bootstrapper), so the report must strip that one BOM
    # itself or it mis-classifies every such line corrupt (round-15
    # hunt finding). '^' anchors once: a double-BOM line keeps its
    # second BOM and stays corrupt, like the reader.
    stripped = F.regexp_replace(F.col("value"), "^" + _BOM, "")
    parsed = F.from_json(
        stripped,
        f"{schema}, {_CORRUPT} string",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
    )
    # blank AND whitespace-only lines are NO rows to the reader (the
    # JSON source needs a token to emit anything), so neither may
    # inflate this health check's denominator — round-12 hostile-JSONL
    # sweep + its review pass
    # JSON whitespace is exactly {space, tab, CR} within a line (\n is
    # the line break) — NOT Java's \s: a vertical-tab- or form-feed-
    # only line IS a (corrupt) row to Jackson, so it must stay in both
    # counts (round-12 review; \S here silently dropped real corrupt
    # records from the health check)
    # Degenerate BOM-whitespace records follow the reader's probed
    # cells (round 15, tests/test_hostile_jsonl.py). Bare \r is a line
    # TERMINATOR to both the text scan and the JSON source (Hadoop
    # line reading), so no record ever contains one, and both strip
    # the FILE-leading BOM before records exist; what remains is the
    # mid-file record that IS exactly one BOM — a CORRUPT row (three
    # bytes: Jackson's 4-byte encoding sniff can't complete, the parse
    # throws) — vs a BOM followed by space/tab-only — NO row at all
    # (BOM skipped, whitespace-skip to EOF). The \r alternative in the
    # regex is defensive for a non-default lineSep ever feeding a
    # CR-bearing record through.
    bom_ws_quirk = F.col("value").startswith(_BOM) & stripped.rlike(
        "^(\r[ \t\r]*)?$"
    )
    is_row = (F.regexp_extract(stripped, "[^ \t\r]", 0) != "") | bom_ws_quirk
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(parsed[_CORRUPT].isNotNull() | bom_ws_quirk, 1)).alias(
            "n_corrupt"
        ),
    ]
    lines = spark.read.text(path).filter(is_row)
    if by_file:
        return (
            lines.groupBy(F.input_file_name().alias("file"))
            .agg(*aggs)
            .orderBy("file")
        )
    return lines.agg(*aggs)


def write_jsonl(
    df: DataFrame, out_dir: str, compression: str | None = "gzip"
) -> None:
    """Write a corpus as JSONL shards (one object per line), gzip by
    default — the format corpora are published in. Spark writes one
    shard per partition; size shards upstream with
    ``repartition``/``compact_parquet``-style math."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(out_dir)
