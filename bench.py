#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed through a noop sink so the full plan runs.
Timing excludes session startup; a warmup pass on sf0.001 primes
codegen and file listing. Each query is timed as the MIN of
$SPARK_GRAFT_BENCH_REPS runs (default 2): the shared host this runs
on shows transient multi-second stalls that land on random queries
(observed: the same query 1.6 s and 32 s minutes apart with an idle
guest), and min-of-N measures the engine, not the neighbor.

Reference per-query seconds (round 2, single-shot, quiet host,
sf0.1): q1 0.88, q5 1.86, q3 1.44, window 0.55, asof 0.71,
sessionize 0.89, ngram 3.16, minhash 2.48, ann 0.92, text 0.29,
multimodal 0.43, csv 0.07, burst 0.66 — total 14.59.
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
    "ann_cosine_topk_ivf",  # IVF cell-join ANN (the 100 TB similarity path)
    "embedding_cosine_pairs",  # hyperplane-LSH near-dup pairs
    "events_hourly_rollup",  # window-bucketed aggregation
    "clean_interpolate_linear",  # window-fill cleaning suite
    "dedup_simhash",  # bit-vote fingerprint + band join
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

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    timings: dict[str, float] = {}
    for n in names:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run_query(qs[n], spark, SF_DIR)
            best = min(best, time.perf_counter() - t0)
        timings[n] = round(best, 4)

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
