#!/usr/bin/env python3
"""Scale probe for the event operators (BASELINE.md rows).

Synthetic 10M-row events table: 1M users, 5 event types, timestamps
hash-spread over 30 days — all deterministic xxhash64 expressions, no
driver loops. Ops:

- ``funnel``: ``events_funnel`` — the Exchange-once stacked-window
  funnel; the claim to verify at 10M is ONE shuffle of the events
  table and nothing quadratic in events-per-user.

Usage:
    python probes/probe_events.py gen    --rows 10000000
    python probes/probe_events.py funnel --rows 10000000
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

from fledge_south_csvplayback_spark.operators import events
from probes._common import (
    PROBE_ROOT,
    probe_session,
    shuffle_delta,
    shuffle_write_bytes,
)

TYPES = ["view", "click", "purchase", "signup", "error"]
USERS = 1_000_000
SPAN_S = 30 * 24 * 3600  # 30 days


def events_dir(n: int) -> str:
    return f"{PROBE_ROOT}/events_{n}"


def gen_events(spark: SparkSession, n: int) -> str:
    out = events_dir(n)
    path = f"{out}/events.parquet"
    if os.path.exists(f"{path}/_SUCCESS"):
        return out
    df = (
        spark.range(n)
        .select(F.col("id").alias("event_id"))
        .select(
            "event_id",
            F.timestamp_seconds(
                F.lit(1700000000)
                + F.pmod(F.xxhash64(F.lit("ts"), F.col("event_id")), SPAN_S)
            ).alias("ts"),
            F.pmod(F.xxhash64(F.lit("u"), F.col("event_id")), USERS).alias(
                "user_id"
            ),
            F.element_at(
                F.lit(TYPES),
                F.pmod(F.xxhash64(F.lit("t"), F.col("event_id")), 5).cast("int")
                + 1,
            ).alias("event_type"),
            (
                F.pmod(F.xxhash64(F.lit("v"), F.col("event_id")), 10000) / 100.0
            ).alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    df.repartition(64).write.mode("overwrite").parquet(path)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "op", choices=["gen", "funnel", "retention", "pivot", "purchase_window"]
    )
    ap.add_argument("--rows", type=int, default=10_000_000)
    args = ap.parse_args()

    spark = probe_session(f"probe_events_{args.op}")
    t0 = time.perf_counter()
    sf_dir = gen_events(spark, args.rows)
    gen_sec = round(time.perf_counter() - t0, 1)
    if args.op == "gen":
        print(json.dumps({"op": "gen", "rows": args.rows, "sec": gen_sec}))
        spark.stop()
        return

    if args.op == "purchase_window":
        # the round-15 bin = window/4 claim, measured in the regime it
        # is about: candidate rows entering the exact-window filter at
        # window-grain bins vs quarter-window bins (overcount bound
        # 2x vs 1.25x of the true matches), plus the full operator's
        # wall and shuffle bytes at this scale
        ev = events._events(spark, sf_dir)
        anchors = ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("anchor_id"), F.col("ts").alias("a_ts")
        )
        probes_df = ev.select("event_id", "user_id", "value", "ts")
        win = events.RANGE_WINDOW_S
        cand = {}
        for label, bin_s in (("window", win), ("window_div4", win // 4)):
            lb = anchors.withColumn(
                "_bin",
                F.explode(
                    F.expr(
                        f"sequence(unix_micros(a_ts) div {bin_s * 1_000_000}, "
                        f"(unix_micros(a_ts) + {win * 1_000_000 - 1}) div "
                        f"{bin_s * 1_000_000})"
                    )
                ),
            )
            rb = probes_df.withColumn(
                "_bin", F.expr(f"unix_micros(ts) div {bin_s * 1_000_000}")
            )
            cand[label] = lb.join(rb, "_bin").count()
        true_matches = events.range_join(
            anchors, probes_df, "a_ts", "ts", win, bin_s=win // 4
        ).count()
        before = shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        events.events_purchase_window(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 1)
        print(
            json.dumps(
                {
                    "op": "purchase_window",
                    "rows": args.rows,
                    "sec": wall,
                    "shuffle_bytes": shuffle_delta(
                        before, shuffle_write_bytes(spark)
                    ),
                    "candidates_bin_window": cand["window"],
                    "candidates_bin_window_div4": cand["window_div4"],
                    "true_window_matches": true_matches,
                }
            )
        )
        spark.stop()
        return

    if args.op in ("retention", "pivot"):
        fn = {
            "retention": events.events_retention,
            "pivot": events.events_type_pivot,
        }[args.op]
        before = shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 1)
        print(
            json.dumps(
                {
                    "op": args.op,
                    "rows": args.rows,
                    "sec": wall,
                    "shuffle_bytes": shuffle_delta(
                        before, shuffle_write_bytes(spark)
                    ),
                }
            )
        )
        spark.stop()
        return

    before = shuffle_write_bytes(spark)
    t0 = time.perf_counter()
    df = events.events_funnel(spark, sf_dir)
    # the tiny steps rollup IS the timed materialization: one pass over
    # the 10M rows (a separate noop write + histogram ran the funnel twice)
    hist = df.groupBy("steps").agg(F.count(F.lit(1)).alias("n")).collect()
    wall = round(time.perf_counter() - t0, 1)
    shuf = shuffle_delta(before, shuffle_write_bytes(spark))
    steps = {r["steps"]: r["n"] for r in hist}
    print(
        json.dumps(
            {
                "op": "funnel",
                "rows": args.rows,
                "users": USERS,
                "sec": wall,
                "shuffle_bytes": shuf,
                "steps_hist": steps,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
