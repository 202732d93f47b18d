#!/usr/bin/env python3
"""Scale probe for the JSONL source + corrupt report (round 15,
BASELINE.md): a 10M-line shard directory with a planted line-class
mix — clean, mid-file-BOM'd clean (the cat-of-BOM'd-shards shape the
round-15 fix made consistent), truncated-corrupt, BOM-only (corrupt),
and blank lines — read through ``read_jsonl_documents`` and audited
through ``jsonl_corrupt_report``.

Checks are CLOSED-FORM: the generator plants classes by ``id % 1000``,
so expected (reader rows, corrupt rows, report n_rows, n_corrupt) are
exact integers; any drift is a real semantics break, not noise. Wall
is the headline: the report's per-line BOM strip + quirk
classification (two regexps + a startswith) must not turn the one-pass
health check into a second-class citizen vs the raw reader scan.

Usage:
    python probes/probe_jsonl.py --rows 10000000
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

# per-1000 line-class plan: 5 BOM'd-clean, 3 truncated-corrupt,
# 1 BOM-only (corrupt row), 1 blank (no row), 990 clean
BOM = "\ufeff"
N_BOM_CLEAN = 5
N_TRUNC = 3
N_BOM_ONLY = 1
N_BLANK = 1


def gen_corpus(spark, rows: int) -> str:
    d = f"{PROBE_ROOT}/jsonl_{rows}"
    if os.path.exists(f"{d}/_DONE"):
        return d
    shutil.rmtree(d, ignore_errors=True)
    clean = F.concat(
        F.lit('{"doc_id": '),
        F.col("id"),
        F.lit(', "text": "doc text '),
        F.col("id") % 9973,
        F.lit('", "lang": "en", "source": "probe", "n_chars": 12}'),
    )
    m = F.col("id") % 1000
    line = (
        F.when(m < N_BOM_CLEAN, F.concat(F.lit(BOM), clean))
        .when(m < N_BOM_CLEAN + N_TRUNC, F.lit('{"doc_id": 1, "text": "tr'))
        .when(m < N_BOM_CLEAN + N_TRUNC + N_BOM_ONLY, F.lit(BOM))
        .when(m < N_BOM_CLEAN + N_TRUNC + N_BOM_ONLY + N_BLANK, F.lit(""))
        .otherwise(clean)
    )
    (
        spark.range(rows)
        .select(line.alias("value"))
        .write.mode("overwrite")
        .text(f"{d}/shards")
    )
    open(f"{d}/_DONE", "w").close()
    return d


def main() -> None:
    from fledge_south_csvplayback_spark.sources import jsonl_source as J

    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    args = ap.parse_args()
    spark = probe_session("probe_jsonl")

    t0 = time.time()
    d = gen_corpus(spark, args.rows)
    gen_s = round(time.time() - t0, 1)

    per_k, full_k = args.rows // 1000, args.rows % 1000
    # id % 1000 < k counts: full thousands contribute k each; the
    # remainder contributes min(full_k, k)
    def planted(k_lo: int, k_hi: int) -> int:
        return (k_hi - k_lo) * per_k + max(
            0, min(full_k, k_hi) - min(full_k, k_lo)
        )

    n_blank = planted(
        N_BOM_CLEAN + N_TRUNC + N_BOM_ONLY,
        N_BOM_CLEAN + N_TRUNC + N_BOM_ONLY + N_BLANK,
    )
    n_corrupt = planted(N_BOM_CLEAN, N_BOM_CLEAN + N_TRUNC + N_BOM_ONLY)
    n_rows = args.rows - n_blank

    # warm the page cache + JIT once (first cold read of the ~1.1 GB
    # text dominated everything on the first cut of this probe: 208 s
    # cold vs 4 s steady-state for the identical plan), then min-of-2
    # per measurement — the engine's cost, not the disk's
    spark.read.text(f"{d}/shards").count()

    def min2(fn):
        return min(
            (lambda t0: (fn(), time.time() - t0))(time.time())[1]
            for _ in range(2)
        )

    got = {}

    def reader_count():
        got["rows"] = J.read_jsonl_documents(spark, f"{d}/shards").count()

    def full_agg():
        got["agg"] = (
            J.read_jsonl_documents(spark, f"{d}/shards", keep_corrupt=True)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count("_corrupt_record").alias("c"),
                F.sum(F.length("text")).alias("len"),
            )
            .collect()[0]
        )

    def report():
        got["rep"] = J.jsonl_corrupt_report(spark, f"{d}/shards").collect()[0]

    reader_s = round(min2(reader_count), 1)
    reader_full_s = round(min2(full_agg), 1)
    report_s = round(min2(report), 1)
    assert got["rows"] == n_rows, (got["rows"], n_rows)
    assert (got["agg"]["n"], got["agg"]["c"]) == (n_rows, n_corrupt)
    rep = got["rep"]
    assert (rep.n_rows, rep.n_corrupt) == (n_rows, n_corrupt), (
        rep,
        n_rows,
        n_corrupt,
    )

    print(
        json.dumps(
            {
                "probe": "jsonl_10m",
                "rows": args.rows,
                "gen_s": gen_s,
                "reader_count_s": reader_s,
                "reader_full_agg_s": reader_full_s,
                "report_s": report_s,
                "n_rows": n_rows,
                "n_corrupt": n_corrupt,
                "reader_rows_per_s": round(args.rows / max(reader_s, 0.1)),
                "report_rows_per_s": round(args.rows / max(report_s, 0.1)),
            }
        )
    )


if __name__ == "__main__":
    main()
