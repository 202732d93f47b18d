"""Small-files compaction — the unglamorous op every long-lived
100 TB pipeline needs.

Streaming sinks, incremental ingests, and fine-grained partitionBy
layouts all produce many small parquet files; at cluster scale the
cost is real (file-listing RPCs, one scan task per tiny file, parquet
footer overhead per file). Compaction rewrites a directory into
~target-sized files: read (the scan glues small files into splits via
``spark.sql.files.maxPartitionBytes``/``openCostInBytes``), repartition
to ``ceil(input_bytes / target_bytes)``, write. The repartition is a
round-robin exchange — the one unavoidable shuffle, sized so each
output file lands near the target.

Deliberately NOT in this module: compact-in-place (rewriting a live
directory is a table-format job — Delta/Iceberg OPTIMIZE hold the
transaction log this needs; a bare-parquet engine compacts to a new
directory and swaps atomically at the catalog/symlink layer).
"""

from __future__ import annotations

import math
import os
import re
from urllib.parse import unquote

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024

# Hive's directory name for a NULL partition value
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"
_URI_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


def _require_local(path: str) -> None:
    """Fail loudly on paths this module's os.walk sizing cannot see.

    ``input_bytes``/``partition_cols`` walk the DRIVER'S local
    filesystem; for a remote URI (s3://, hdfs://) they would silently
    return 0 bytes and no partition columns, degrading
    ``compact_parquet`` to a repartition(1) with a flattened layout —
    the opposite of failing. Remote stores need the store's listing
    API (same contract, different walker); until one is wired in,
    misuse raises instead of corrupting the layout."""
    if _URI_SCHEME.match(path):
        raise ValueError(
            f"compaction sizing walks the local filesystem; remote URI "
            f"{path!r} is not supported (its listing must come from the "
            f"object store's API)"
        )
    if not os.path.exists(path):
        raise ValueError(f"compaction input path does not exist: {path!r}")


def input_bytes(path: str) -> int:
    """Total bytes of parquet data files under ``path`` (local FS
    only — raises on remote URIs / missing paths, see
    ``_require_local``)."""
    _require_local(path)
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    return total


def partition_cols(path: str) -> list[str]:
    """Hive partition columns of a parquet directory, outermost first,
    discovered from the ``k=v`` directory names (the same layout
    ``spark.read.parquet`` infers partition columns from)."""
    _require_local(path)
    cols: list[str] = []
    cur = path
    while os.path.isdir(cur):
        sub = [d for d in os.listdir(cur) if "=" in d and os.path.isdir(os.path.join(cur, d))]
        if not sub:
            break
        cols.append(sub[0].split("=", 1)[0])
        cur = os.path.join(cur, sub[0])
    return cols


def _leaf_sizes(path: str, pcols: list[str]) -> dict[tuple[str, ...], int]:
    """Bytes per partition-value tuple, walking the hive layout; value
    strings are URL-decoded like Spark decodes them (``%20`` etc.);
    NULL values keep the ``__HIVE_DEFAULT_PARTITION__`` sentinel."""
    out: dict[tuple[str, ...], int] = {}

    def rec(cur: str, vals: list[str]) -> None:
        if len(vals) == len(pcols):
            out[tuple(vals)] = input_bytes(cur)
            return
        pref = pcols[len(vals)] + "="
        for d in os.listdir(cur):
            full = os.path.join(cur, d)
            if os.path.isdir(full) and d.startswith(pref):
                rec(full, vals + [unquote(d[len(pref):])])

    rec(path, [])
    return out


def compact_parquet(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> int:
    """Rewrite ``in_dir`` into ``out_dir`` as ~``target_bytes`` files;
    returns the output data-file count.

    Flat input: ``repartition(n)`` (round-robin, not keyed) spreads
    rows evenly regardless of input skew — a coalesce() would glue
    whole input partitions and inherit their size imbalance, and can
    starve parallelism below the cluster's core count during the
    write. Hive-partitioned input: the discovered partition layout is
    PRESERVED (flattening it would silently cost every downstream
    reader its partition pruning), and the pre-write repartition keys
    on the partition columns so each value's rows land in one task —
    one output file per value, not n×|values| fragments.

    ``target_bytes`` also bounds file sizes WITHIN the partitioned
    layout: values whose on-disk bytes exceed the target get a bounded
    deterministic salt — ``pmod(xxhash64(data cols), ceil(bytes /
    target))`` — appended to the repartition keys, splitting only the
    oversized values into ~target-sized files while under-target
    values keep salt 0 and stay one file each. The salt column is
    dropped before the write (it exists to place rows, not to be
    stored). Deterministic (content-hash, no RNG); the per-value split
    is approximate — hash placement spreads rows ~evenly, compression
    may vary per bucket."""
    n = max(1, math.ceil(input_bytes(in_dir) / target_bytes))
    df = spark.read.parquet(in_dir)
    pcols = partition_cols(in_dir)
    if pcols:
        over = {
            vals: math.ceil(b / target_bytes)
            for vals, b in _leaf_sizes(in_dir, pcols).items()
            if b > target_bytes
        }
        if over:
            data_cols = [c for c in df.columns if c not in pcols]
            h = F.xxhash64(*data_cols)
            salt = F.lit(0)
            for vals, k in over.items():
                cond = F.lit(True)
                for p, v in zip(pcols, vals):
                    cond = cond & (
                        F.col(p).isNull()
                        if v == _HIVE_NULL
                        else (F.col(p).cast("string") == F.lit(v))
                    )
                salt = F.when(cond, F.pmod(h, F.lit(k))).otherwise(salt)
            writer = df.withColumn("_salt", salt).repartition(
                n, *pcols, "_salt"
            ).drop("_salt")
        else:
            writer = df.repartition(n, *pcols)
    else:
        writer = df.repartition(n)
    writer.write.mode("overwrite").partitionBy(*pcols).parquet(out_dir)
    total = 0
    for root, _dirs, files in os.walk(out_dir):
        total += sum(1 for f in files if f.endswith(".parquet"))
    return total
