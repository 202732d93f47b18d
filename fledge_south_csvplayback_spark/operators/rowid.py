"""Distributed global row numbering (W4, reference csvplayback.py:734-756).

The reference's timestamp synthesis is positional: row *k* of the
playback gets a timestamp derived from *k*. A naive Spark translation
is ``row_number().over(Window.orderBy(...))`` — which funnels the whole
dataset through ONE partition. This helper computes the same 0-based
rank scalably:

1. ``repartitionByRange`` on the order columns (explicit partition
   count, so AQE can't re-plan it differently between the two jobs);
2. per-partition ``row_number`` (each window bounded by one partition);
3. per-partition counts — a tiny aggregate collected to the driver —
   turned into cumulative offsets and added back as a literal map.

Two passes over the input (same as RDD ``zipWithIndex``), both fully
parallel. Ties across the order columns would make the rank
nondeterministic (true of any row_number) — callers pass a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_row_number(
    df: DataFrame, order_cols: list[str], col_name: str = "k"
) -> DataFrame:
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    part = df.repartitionByRange(n_part, *[F.col(c) for c in order_cols])
    part = part.withColumn("_pid", F.spark_partition_id())
    counts = {
        r._pid: r.cnt
        for r in part.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    if not counts:
        return df.withColumn(col_name, F.lit(0).cast("long")).filter(F.lit(False))
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):  # range partitions are ordered by key range
        offsets[pid] = acc
        acc += counts[pid]
    offset_map = F.create_map(
        *[F.lit(x) for pid_off in sorted(offsets.items()) for x in pid_off]
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return part.withColumn(
        col_name,
        (offset_map[F.col("_pid")] + F.row_number().over(w) - 1).cast("long"),
    ).drop("_pid")
