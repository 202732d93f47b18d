#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is collected (or counted, for large outputs) so the full
plan executes. Timing excludes session startup; a warmup pass on
sf0.001 primes codegen and file listing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fledge_south_csvplayback_spark import registry
from fledge_south_csvplayback_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_DIR = "/root/testdata/sf0.001"

# Headline subset: biggest-shuffle / most-representative query per suite.
# Falls back to every registered query if a headline name is missing.
HEADLINE = [
    "q1_pricing_summary",  # scan + hash agg
    "q5_regional_revenue",  # broadcast star join + fact-fact joins
    "q3_shipping_priority",  # fact-fact join + top-k
    "q_top_orders_per_priority",  # partitioned window
    "events_asof_click",  # as-of join (union + ordered window)
    "events_sessionize",  # lag + running-sum sessions
    "dedup_ngram_jaccard",  # inverted-index self-join (heaviest shuffle)
    "dedup_minhash_lsh",  # signature + banded candidate join
    "ann_cosine_topk",  # broadcast brute-force cosine
    "text_stats",  # array-expression scan
    "multimodal_features",  # Arrow mapInPandas path
    "csv_pick_from_file",  # CSV source layer
    "playback_burst_envelope",  # burst playback throughput (600k readings at sf0.1)
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_query(qfn, spark, sf_dir: str) -> None:
    df = qfn(spark, sf_dir)
    # noop sink: executes the full plan exactly once (count() would let
    # Catalyst prune aggregate measures; collect() adds driver transfer).
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="bench")
    qs = registry.all_queries()
    names = [n for n in HEADLINE if n in qs] or sorted(qs)

    for n in names:  # warmup at tiny SF
        try:
            run_query(qs[n], spark, WARMUP_DIR)
        except Exception as e:  # noqa: BLE001 — warmup failures must be visible
            print(f"warmup failed for {n}: {e!r}", file=sys.stderr)

    timings: dict[str, float] = {}
    for n in names:
        t0 = time.perf_counter()
        run_query(qs[n], spark, SF_DIR)
        timings[n] = round(time.perf_counter() - t0, 4)

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
