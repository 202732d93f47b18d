#!/usr/bin/env python3
"""Scale probe for the corpus-wide boilerplate (repeated-line) scrub
(BASELINE.md rows).

Corpus: N docs x 8 lines; each line is, by seeded hash, either one of
POOL=1000 shared "nav/cookie" boilerplate lines (p=1/4 — so each pool
line lands in ~N/4000 documents, far above min_df) or a doc-unique
5-word line (df=1). Expected scrub behavior: every boilerplate
instance removed (~25% of line instances), every unique line kept —
the probe asserts the removed fraction lands in [0.24, 0.26] so the
throughput row can't silently measure a no-op.

Usage:
    python probes/probe_boilerplate.py gen          --rows 10000000
    python probes/probe_boilerplate.py scrub        --rows 10000000
    python probes/probe_boilerplate.py scrub_hashed --rows 10000000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from probes._common import (
    PROBE_ROOT,
    probe_session,
    shuffle_delta,
    shuffle_write_bytes,
)

LINES = 8
POOL = 1000
VOCAB = 1_000_000


def corpus_dir(n: int) -> str:
    return f"{PROBE_ROOT}/boiler_{n}_{LINES}"


def gen_corpus(spark: SparkSession, n: int) -> str:
    out = corpus_dir(n)
    path = f"{out}/documents.parquet"
    if os.path.exists(f"{path}/_SUCCESS"):
        return out
    line_cols = []
    for i in range(LINES):
        is_b = (
            F.pmod(F.xxhash64(F.lit("bp"), F.col("doc_id"), F.lit(i)), 4) == 0
        )
        pool = F.concat(
            F.lit("nav"),
            F.pmod(F.xxhash64(F.lit("pool"), F.col("doc_id"), F.lit(i)), POOL),
            F.lit(" home about contact accept all cookies"),
        )
        uniq = F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("u"),
                    F.pmod(
                        F.xxhash64(
                            F.lit("uq"), F.col("doc_id"), F.lit(i), F.lit(p)
                        ),
                        VOCAB,
                    ),
                )
                for p in range(5)
            ],
        )
        line_cols.append(F.when(is_b, pool).otherwise(uniq))
    df = (
        spark.range(n)
        .select(F.col("id").alias("doc_id"))
        .select("doc_id", F.concat_ws("\n", *line_cols).alias("text"))
    )
    df.repartition(64).write.mode("overwrite").parquet(path)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("op", choices=["gen", "scrub", "scrub_hashed"])
    ap.add_argument("--rows", type=int, default=10_000_000)
    args = ap.parse_args()

    spark = probe_session(f"probe_boiler_{args.op}")
    t0 = time.perf_counter()
    sf_dir = gen_corpus(spark, args.rows)
    gen_sec = round(time.perf_counter() - t0, 1)
    if args.op == "gen":
        print(json.dumps({"op": "gen", "rows": args.rows, "sec": gen_sec}))
        spark.stop()
        return

    from fledge_south_csvplayback_spark.operators import text

    shuffle_before = shuffle_write_bytes(spark)
    t0 = time.perf_counter()
    out = text.text_boilerplate_scrub(
        spark, sf_dir, hashed=(args.op == "scrub_hashed")
    )
    agg = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_lines").alias("lines"),
        F.sum("removed_lines").alias("removed"),
        F.sum("removed_chars").alias("removed_chars"),
    ).collect()[0]
    wall = round(time.perf_counter() - t0, 1)
    shuffle = shuffle_delta(shuffle_before, shuffle_write_bytes(spark))
    frac = agg["removed"] / agg["lines"]
    assert 0.24 <= frac <= 0.26, frac  # the scrub actually scrubbed
    print(
        json.dumps(
            {
                "op": args.op,
                "rows": args.rows,
                "gen_sec": gen_sec,
                "wall_sec": wall,
                "docs_per_sec": round(args.rows / wall, 1) if wall else None,
                "shuffle_bytes": shuffle,
                "docs": agg["docs"],
                "line_instances": agg["lines"],
                "removed_lines": agg["removed"],
                "removed_frac": round(frac, 4),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
