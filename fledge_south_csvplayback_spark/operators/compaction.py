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

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def input_bytes(path: str) -> int:
    """Total bytes of parquet data files under ``path`` (local FS; on
    an object store the file listing comes from the store's API —
    same contract, different walker)."""
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
    cols: list[str] = []
    cur = path
    while os.path.isdir(cur):
        sub = [d for d in os.listdir(cur) if "=" in d and os.path.isdir(os.path.join(cur, d))]
        if not sub:
            break
        cols.append(sub[0].split("=", 1)[0])
        cur = os.path.join(cur, sub[0])
    return cols


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
    one output file per value, not n×|values| fragments. A huge
    single partition value then compacts to one large file; split it
    by adding a salt column to the layout, not here."""
    n = max(1, math.ceil(input_bytes(in_dir) / target_bytes))
    df = spark.read.parquet(in_dir)
    pcols = partition_cols(in_dir)
    writer = df.repartition(n, *pcols) if pcols else df.repartition(n)
    writer.write.mode("overwrite").partitionBy(*pcols).parquet(out_dir)
    total = 0
    for root, _dirs, files in os.walk(out_dir):
        total += sum(1 for f in files if f.endswith(".parquet"))
    return total
