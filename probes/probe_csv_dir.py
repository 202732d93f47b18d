#!/usr/bin/env python3
"""Scale probe for the per-file DIRECTORY line-oriented CSV machinery
(round 15, BASELINE.md): a sensor directory of N small files read with
skip_rows (the S1×S4 envelope whose global-skip version silently
corrupted before round 15), vs the native schema-pinned directory read
(the documented fast path), vs a driver LOOP of per-file reads (what a
caller had to do before the per-file machinery existed — one Spark
plan per file).

Measures wall for each strategy, asserts all three agree on row count
and column sum (the per-file loop is skipped past --files 2000: its
per-file plan cost is the point being beaten), and prints one JSON
line. The per-file machinery's cost structure: ONE extents aggregate
(map-side, one row per file), ONE bounded head collect (≤ ~10 lines ×
N files to the driver), one literal-map filter over the data — so the
gap to the native path should stay a small constant factor, not grow
with N.

Usage:
    python probes/probe_csv_dir.py --files 1000 --rows 1000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from probes._common import PROBE_ROOT, probe_session


def gen_dir(n_files: int, rows: int) -> str:
    d = f"{PROBE_ROOT}/csv_dir_{n_files}_{rows}"
    if os.path.exists(f"{d}/_DONE"):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    for i in range(n_files):
        with open(f"{d}/sensor_{i:05d}.csv", "w") as f:
            f.write(f"# sensor {i} preamble\n")  # the skip_rows=1 line
            f.write("ts,value\n")
            base = i * rows
            f.write("".join(f"{base + j},{j % 97}\n" for j in range(rows)))
    open(f"{d}/_DONE", "w").close()
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=1000)
    ap.add_argument("--rows", type=int, default=1000)
    ap.add_argument("--skip-loop", action="store_true")
    args = ap.parse_args()

    from fledge_south_csvplayback_spark.sources import csv_source as cs

    spark = probe_session("probe_csv_dir")
    d = gen_dir(args.files, args.rows)
    expect_rows = args.files * args.rows

    def run(tag, build):
        t0 = time.perf_counter()
        df = build()
        agg = df.agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
        ).collect()[0]
        return {
            f"{tag}_sec": round(time.perf_counter() - t0, 2),
            f"{tag}_rows": agg["n"],
            f"{tag}_sum": float(agg["s"]),
        }

    out = {"op": "csv_dir", "files": args.files, "rows_per_file": args.rows}
    # per-file line-oriented directory read (the round-15 machinery)
    out.update(
        run("perfile", lambda: cs.read_pick_from_file(spark, d, skip_rows=1))
    )
    # native schema-pinned read: the preamble is blank-UNLIKE ('#...'),
    # so the native reader cannot skip it — strip via a filter instead:
    # this arm measures the native scan cost as the floor, not identical
    # semantics (the pinned-schema reader treats the preamble line as a
    # data row that nulls out, and the header skip eats the preamble
    # instead of the header — hence the value filter to align counts)
    out.update(
        run(
            "native_floor",
            lambda: cs.read_pick_from_file(
                spark, d, schema="ts bigint, value bigint"
            ).filter(F.col("ts").isNotNull() & F.col("value").isNotNull()),
        )
    )
    # driver loop of per-file single-file reads (the pre-round-15
    # workaround): one plan per file, unioned
    if args.files <= 2000 and not args.skip_loop:
        def loop():
            files = cs.find_csv_files(d)
            parts = [
                cs.read_pick_from_file(
                    spark, f, skip_rows=1, schema="ts bigint, value bigint"
                )
                for f in files
            ]
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
            return df

        out.update(run("loop", loop))
    # ragged arm: per-file numbering (the one-Exchange window path) —
    # row_id must cover [0, N) exactly (global, gap-free, file-ordered)
    t0 = time.perf_counter()
    rdf = cs.read_ragged(spark, d, skip_rows=2)  # skip preamble + header
    ragg = rdf.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("row_id").alias("lo"),
        F.max("row_id").alias("hi"),
        F.count_distinct("row_id").alias("d"),
    ).collect()[0]
    out["ragged_sec"] = round(time.perf_counter() - t0, 2)
    out["ragged_rows"] = ragg["n"]
    out["ragged_ids_dense"] = bool(
        ragg["lo"] == 0
        and ragg["hi"] == ragg["n"] - 1
        and ragg["d"] == ragg["n"]
    )
    ok = (
        out["perfile_rows"] == expect_rows
        and out["ragged_rows"] == expect_rows
        and out["ragged_ids_dense"]
        and all(
            out[f"{t}_sum"] == out["perfile_sum"]
            for t in ("native_floor", "loop")
            if f"{t}_sum" in out
        )
    )
    out["agree"] = bool(ok)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
