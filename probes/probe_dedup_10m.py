#!/usr/bin/env python3
"""Scale probes for the dedup operators (BASELINE.md "Measured at scale").

Generates a synthetic planted-near-dup corpus with pure Spark
expressions (no driver-side loops), runs ONE operator per invocation in
a fresh session, and prints one JSON line with wall seconds, shuffle
bytes (from the live UI REST API), output rows, and recall / false
positives against the planted pairs.

Corpus layout (deterministic, seeded by xxhash64 literals):
- N docs of W words each; words drawn as ``w<xxhash64(base_id, pos) %
  VOCAB>`` over a 1M-word vocabulary, so cross-document shingle
  collisions are negligible and the document-frequency cap never
  engages (the cap path has its own planted-hot-shingle pytest).
- the last K = N/1000 docs are near-dups: doc N-K+b repeats base doc
  b's text plus ONE appended tail word. At W=25 that is 23 shared
  3-gram shingles of 24 = Jaccard 0.9583 (the same planted geometry as
  the round-3 ngram probe: miss probability of the 8x4 MinHash bands
  at j=0.958 is (1-j^4)^8 ~ 4e-7, so LSH recall should be ~100%).
- corpora are cached under /tmp/spark_graft_probe/docs_<N>_<W>/ and
  reused across invocations (generation is excluded from timings).

Usage:
    python probes/probe_dedup_10m.py minhash_lsh --rows 10000000
    python probes/probe_dedup_10m.py simhash     --rows 200000
    python probes/probe_dedup_10m.py ngram_jaccard --rows 10000000
    python probes/probe_dedup_10m.py gen --rows 10000000 --words 25

Operators run through the same public functions the registry serves;
``simhash`` uses the production hash path (reproducible=False) — the
md5-string path exists for oracle parity, not scale (see
operators/dedup.py docstrings).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from probes._common import (
    PROBE_ROOT,
    probe_session,
    shuffle_delta,
    shuffle_write_bytes,
)

VOCAB = 1_000_000


def corpus_dir(n: int, words: int) -> str:
    return f"{PROBE_ROOT}/docs_{n}_{words}"


def gen_corpus(spark: SparkSession, n: int, words: int) -> str:
    """Write documents.parquet with K=n/1000 planted near-dup pairs."""
    out = corpus_dir(n, words)
    path = f"{out}/documents.parquet"
    if os.path.exists(f"{path}/_SUCCESS"):
        return out
    k = n // 1000
    base_id = F.when(
        F.col("doc_id") >= n - k, F.col("doc_id") - (n - k)
    ).otherwise(F.col("doc_id"))
    word_cols = [
        F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.lit("probe"), F.col("base"), F.lit(p)), F.lit(VOCAB)),
        )
        for p in range(words)
    ]
    tail = F.concat(
        F.lit("x"), F.pmod(F.xxhash64(F.lit("tail"), F.col("doc_id")), F.lit(VOCAB))
    )
    df = (
        spark.range(n)
        .select(F.col("id").alias("doc_id"))
        .withColumn("base", base_id)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") >= n - k,
                F.concat_ws(" ", *word_cols, tail),
            )
            .otherwise(F.concat_ws(" ", *word_cols))
            .alias("text"),
        )
    )
    df.repartition(64).write.mode("overwrite").parquet(path)
    return out


def planted_pairs(spark: SparkSession, n: int) -> DataFrame:
    k = n // 1000
    return spark.range(k).select(
        F.col("id").alias("doc_a"), (F.col("id") + (n - k)).alias("doc_b")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "op",
        choices=[
            "gen",
            "minhash_lsh",
            "simhash",
            "simhash_blocked",
            "ngram_jaccard",
            "clusters",
            "neardup_ingest",
            "span_scrub",
            "keep_best_ab",
            "lexical_topk",
            "bm25_indexed",
            "bm25_append",
            "bm25_liststress",
            "bpe",
            "neardup_fold",
            "cc_loop",
        ],
    )
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--words", type=int, default=25)
    ap.add_argument(
        "--flip",
        action="store_true",
        help="keep_best_ab: reverse arm order (ordering-artifact check)",
    )
    ap.add_argument(
        "--reproducible",
        action="store_true",
        help="simhash: use the md5-string oracle path instead of production",
    )
    args = ap.parse_args()

    spark = probe_session(f"probe_{args.op}")

    if args.op == "cc_loop":
        # the round-15 claim measured in its regime: the CC loop runs
        # ONE Spark job per iteration (convergence label-sum rides the
        # eager localCheckpoint as an observe metric; init fused with
        # iteration 1). Synthetic chain graph: chains of 4 nodes over
        # --rows nodes (diameter 3 -> 3 propagation iterations + the
        # confirm pass), labels verified against the closed form.
        import urllib.request

        from fledge_south_csvplayback_spark.operators import dedup

        n = args.rows
        pairs = (
            spark.range(n)
            .filter(F.pmod(F.col("id"), 4) != 3)
            .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
        )

        def n_jobs() -> int:
            url = spark.sparkContext.uiWebUrl
            app = spark.sparkContext.applicationId
            with urllib.request.urlopen(
                f"{url}/api/v1/applications/{app}/jobs", timeout=10
            ) as r:
                return len(json.load(r))

        # OLD convergence form for contrast (pre-round-15): identity
        # init as its own distinct, and per iteration a checkpoint PLUS
        # a new-vs-old equi-join + count — the extra all-labels join
        # shuffle per iteration the observe-on-checkpoint removed.
        def cc_old(edges_df):
            edges = edges_df.select("doc_a", "doc_b")
            edges = edges.union(
                edges.select(
                    F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
                )
            ).localCheckpoint(eager=True)
            labels = (
                edges.select(F.col("doc_a").alias("doc_id"))
                .distinct()
                .select("doc_id", F.col("doc_id").alias("label"))
                .localCheckpoint(eager=True)
            )
            for _ in range(20):
                prop = edges.join(
                    labels, edges["doc_a"] == labels["doc_id"], "inner"
                ).select(F.col("doc_b").alias("doc_id"), "label")
                new_labels = (
                    labels.select("doc_id", "label")
                    .union(prop)
                    .groupBy("doc_id")
                    .agg(F.min("label").alias("label"))
                    .localCheckpoint(eager=True)
                )
                changed = (
                    new_labels.alias("n")
                    .join(labels.alias("o"), "doc_id")
                    .filter(F.col("n.label") != F.col("o.label"))
                    .count()
                )
                labels = new_labels
                if changed == 0:
                    return labels
            raise RuntimeError("no convergence")

        before_jobs, before_shuf = n_jobs(), shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        labels_old = cc_old(pairs)
        old_wall = round(time.perf_counter() - t0, 1)
        old_jobs = n_jobs() - before_jobs
        old_shuf = shuffle_delta(before_shuf, shuffle_write_bytes(spark))

        before_jobs, before_shuf = n_jobs(), shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        labels = dedup.connected_components(pairs, "doc_a", "doc_b")
        loop_jobs = n_jobs() - before_jobs  # the loop is EAGER; the
        # returned frame is a projection of the last checkpoint
        new_shuf = shuffle_delta(before_shuf, shuffle_write_bytes(spark))
        bad = labels.filter(
            F.col("cluster_id") != F.col("doc_id") - F.pmod(F.col("doc_id"), 4)
        ).count()
        bad_old = labels_old.filter(
            F.col("label") != F.col("doc_id") - F.pmod(F.col("doc_id"), 4)
        ).count()
        wall = round(time.perf_counter() - t0, 1)
        print(
            json.dumps(
                {
                    "op": "cc_loop",
                    "nodes": n,
                    "edges_each_direction": int(n - n // 4),
                    "chain_len": 4,
                    "sec": wall,
                    "loop_jobs": loop_jobs,
                    "shuffle_bytes": new_shuf,
                    "old_sec": old_wall,
                    "old_jobs": old_jobs,
                    "old_shuffle_bytes": old_shuf,
                    "wrong_labels": bad,
                    "wrong_labels_old_form": bad_old,
                }
            )
        )
        spark.stop()
        return

    t0 = time.perf_counter()
    sf_dir = gen_corpus(spark, args.rows, args.words)
    gen_sec = round(time.perf_counter() - t0, 1)
    if args.op == "gen":
        print(json.dumps({"op": "gen", "rows": args.rows, "sec": gen_sec}))
        spark.stop()
        return

    from fledge_south_csvplayback_spark.operators import dedup

    if args.op == "span_scrub":
        # ExactSubstr repeated-span removal on the planted-dup corpus:
        # every planted pair shares its full 25-token base text, so all
        # 16 w=10 windows repeat and coverage is exactly the 25 base
        # tokens in BOTH members; the appended tail word survives.
        # Expected removal is therefore deterministic: 25 tokens x 2K
        # docs — asserted, so the throughput row cannot measure a no-op
        # (1M-word vocab makes accidental 10-gram repeats negligible).
        from fledge_south_csvplayback_spark.operators import text as text_ops

        k = args.rows // 1000
        shuffle_before = shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        agg = (
            text_ops.text_repeated_span_scrub(
                spark, sf_dir, hashed=args.reproducible is False
            )
            .agg(
                F.sum("n_tokens").alias("tokens"),
                F.sum("removed_tokens").alias("removed"),
            )
            .collect()[0]
        )
        wall = round(time.perf_counter() - t0, 1)
        shuffle = shuffle_delta(shuffle_before, shuffle_write_bytes(spark))
        expected = 2 * k * args.words
        print(
            json.dumps(
                {
                    "op": args.op,
                    "rows": args.rows,
                    "hashed": args.reproducible is False,
                    "gen_sec": gen_sec,
                    "wall_sec": wall,
                    "docs_per_sec": round(args.rows / wall, 1) if wall else None,
                    "shuffle_bytes": shuffle,
                    "tokens": agg["tokens"],
                    "removed_tokens": agg["removed"],
                    "expected_removed": expected,
                    "exact": agg["removed"] == expected,
                }
            )
        )
        spark.stop()
        return

    if args.op == "neardup_ingest":
        # corpus = all docs below the planted-dup block, batch = the
        # planted dups themselves -> every cross pair is a planted pair
        # and the probe's recall is the planted recall. The index build
        # is timed separately (it is the amortized ingest-time cost);
        # the ingest row is the per-batch maintenance number the op
        # exists for — compare its shuffle bytes with the full miner's
        # corpus-sized row above it in BASELINE.md.
        k = args.rows // 1000
        split = args.rows - k
        index_dir = f"{sf_dir}/neardup_index"
        t0 = time.perf_counter()
        dedup.build_neardup_index(spark, sf_dir, index_dir, max_doc_id=split)
        build_sec = round(time.perf_counter() - t0, 1)
        shuffle_before = shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        out = (
            dedup.neardup_ingest(spark, sf_dir, index_dir, split_id=split)
            .select("doc_a", "doc_b")
            .cache()
        )
        n_out = out.count()
        wall = round(time.perf_counter() - t0, 1)
        shuffle = shuffle_delta(shuffle_before, shuffle_write_bytes(spark))
        expected = planted_pairs(spark, args.rows)
        n_hit = out.join(expected, ["doc_a", "doc_b"]).count()
        print(
            json.dumps(
                {
                    "op": args.op,
                    "rows": args.rows,
                    "batch_docs": k,
                    "gen_sec": gen_sec,
                    "index_build_sec": build_sec,
                    "ingest_wall_sec": wall,
                    "ingest_shuffle_bytes": shuffle,
                    "out_pairs": n_out,
                    "planted": k,
                    "recall": round(n_hit / k, 4) if k else None,
                    "false_pos": n_out - n_hit,
                }
            )
        )
        spark.stop()
        return

    if args.op == "neardup_fold":
        # round-14 maintenance probe: after N real micro-batch ingests
        # the streaming near-dup gate lists N partitions per table;
        # compact_text_neardup_batches (shingles/bands row fold) +
        # compact_text_neardup_index (df sum fold) collapse the layout.
        # Measured: per-batch gate wall early vs late in the history,
        # both fold walls, and the gate wall immediately after folding
        # — the claim is wall recovery, with exact batch-output
        # invariance already pinned in pytest.
        import shutil

        from fledge_south_csvplayback_spark.streaming import (
            corpus_ingest as CI,
        )

        n_batches = 50
        batch_sz = 2_000
        idx = f"{PROBE_ROOT}/neardup_fold_idx_{args.rows}"
        out = f"{PROBE_ROOT}/neardup_fold_out_{args.rows}"
        for d in (idx, out):
            if os.path.exists(d):
                shutil.rmtree(d)
        corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")

        def batch_docs(b: int) -> DataFrame:
            start = args.rows + b * batch_sz
            wc = [
                F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64(F.lit("probe"), F.col("doc_id"), F.lit(p)),
                        F.lit(VOCAB),
                    ),
                )
                for p in range(args.words)
            ]
            return (
                spark.range(start, start + batch_sz)
                .select(F.col("id").alias("doc_id"))
                .select(
                    "doc_id",
                    F.concat_ws(" ", *wc).alias("text"),
                    F.lit("en").alias("lang"),
                    F.lit("probe").alias("source"),
                    F.lit(25 * 8).alias("n_chars"),
                )
            )

        t0 = time.perf_counter()
        CI.seed_text_neardup_index(spark, corpus, idx)
        seed_sec = round(time.perf_counter() - t0, 1)
        gate_walls = []
        for b in range(n_batches):
            t0 = time.perf_counter()
            CI.accept_batch(batch_docs(b), b, out, index_dir=idx)
            gate_walls.append(round(time.perf_counter() - t0, 1))
        t0 = time.perf_counter()
        CI.compact_text_neardup_batches(spark, idx)
        fold_batches_sec = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        CI.compact_text_neardup_index(spark, idx)
        fold_df_sec = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        CI.accept_batch(batch_docs(n_batches), n_batches, out, index_dir=idx)
        gate_after_fold = round(time.perf_counter() - t0, 1)
        print(
            json.dumps(
                {
                    "op": "neardup_fold",
                    "rows": args.rows,
                    "batch_docs": batch_sz,
                    "n_batches": n_batches,
                    "seed_sec": seed_sec,
                    "gate_first5_sec": gate_walls[:5],
                    "gate_last5_sec": gate_walls[-5:],
                    "fold_batches_sec": fold_batches_sec,
                    "fold_df_sec": fold_df_sec,
                    "gate_after_fold_sec": gate_after_fold,
                }
            )
        )
        spark.stop()
        return

    if args.op == "lexical_topk":
        # sparse retrieval arm at 10M: |Q| query-token arrays broadcast
        # into one corpus scan, partial WindowGroupLimit ranking — the
        # claim under test is the SHUFFLE column (≤ tasks·|Q|·k survivor
        # rows, KBs, never corpus·|Q| scored rows)
        from fledge_south_csvplayback_spark.operators import similarity as sim

        shuffle_before = shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        rows = sim.lexical_topk(spark, sf_dir).collect()
        wall = round(time.perf_counter() - t0, 1)
        shuffle = shuffle_delta(shuffle_before, shuffle_write_bytes(spark))
        n_q = len({r.query_id for r in rows})
        print(
            json.dumps(
                {
                    "op": "lexical_topk",
                    "rows": args.rows,
                    "gen_sec": gen_sec,
                    "wall_sec": wall,
                    "docs_per_sec": round(args.rows / wall, 1) if wall else None,
                    "shuffle_bytes": shuffle,
                    "out_rows": len(rows),
                    "queries": n_q,
                    "complete": len(rows) == n_q * sim.TOP_K,
                }
            )
        )
        spark.stop()
        return

    if args.op == "bm25_indexed":
        # persisted inverted index at 10M: one-time build cost, then a
        # query that reads ONLY its terms' hash buckets — the claims
        # under test are the pruned input volume (rows_read ≪ postings)
        # and exact agreement with the inline two-scan operator
        from fledge_south_csvplayback_spark.operators import text as T

        idx = f"{PROBE_ROOT}/bm25_idx_{args.rows}"
        # probe corpus words are 'w<hash>'; pick real corpus tokens so
        # the query actually matches documents
        sample = [
            r["t"]
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
            .limit(1)
            .select(F.explode(F.split("text", " ")).alias("t"))
            .limit(3)
            .collect()
        ]
        t0 = time.perf_counter()
        if not os.path.exists(f"{idx}/_stats"):
            T.build_bm25_index(spark, sf_dir, idx)
        build = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        inline = [
            tuple(r) for r in T.text_bm25_topk(spark, sf_dir, query=tuple(sample)).collect()
        ]
        inline_wall = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        indexed = [
            tuple(r)
            for r in T.text_bm25_topk_indexed(
                spark, sf_dir, idx, query=tuple(sample)
            ).collect()
        ]
        indexed_wall = round(time.perf_counter() - t0, 1)
        print(
            json.dumps(
                {
                    "op": "bm25_indexed",
                    "rows": args.rows,
                    "build_sec": build,
                    "inline_query_sec": inline_wall,
                    "indexed_query_sec": indexed_wall,
                    "exact_agreement": indexed == inline,
                    "out_rows": len(indexed),
                    "query_terms": sample,
                }
            )
        )
        spark.stop()
        return

    if args.op == "bm25_append":
        # round-13 verdict items 4+5: the append path's "batch-sized
        # work" claim at corpus scale, and the compaction's query-wall
        # recovery after N micro-batch appends. Seed index over the
        # corpus, one measured 10k-doc append (wall + shuffle +
        # bit-exactness vs a full rebuild of corpus+batch), then N-1
        # more appends to fragment the buckets, query wall before/after
        # compact_bm25_index, exact agreement throughout.
        from fledge_south_csvplayback_spark.operators import text as T

        import shutil

        n_batches = 20
        batch_sz = 10_000
        idx = f"{PROBE_ROOT}/bm25_append_idx_{args.rows}"
        if os.path.exists(idx):
            shutil.rmtree(idx)  # appends mutate: always start fresh

        def batch_docs(b: int) -> DataFrame:
            start = args.rows + b * batch_sz
            wc = [
                F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64(F.lit("probe"), F.col("doc_id"), F.lit(p)),
                        F.lit(VOCAB),
                    ),
                )
                for p in range(args.words)
            ]
            return (
                spark.range(start, start + batch_sz)
                .select(F.col("id").alias("doc_id"))
                .select("doc_id", F.concat_ws(" ", *wc).alias("text"))
            )

        sample = [
            r["t"]
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
            .limit(1)
            .select(F.explode(F.split("text", " ")).alias("t"))
            .limit(3)
            .collect()
        ]
        q = tuple(sample)
        t0 = time.perf_counter()
        T.build_bm25_index(spark, sf_dir, idx)
        build = round(time.perf_counter() - t0, 1)
        shuffle_before = shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        T.append_bm25_index(spark, batch_docs(0), idx)
        append_wall = round(time.perf_counter() - t0, 1)
        append_shuffle = shuffle_delta(shuffle_before, shuffle_write_bytes(spark))
        # bit-exactness of the measured append vs a full rebuild
        corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
        idx_rb = f"{PROBE_ROOT}/bm25_rebuild_idx_{args.rows}"
        t0 = time.perf_counter()
        T.build_bm25_index(
            spark, sf_dir, idx_rb, docs=corpus.unionByName(batch_docs(0))
        )
        rebuild_wall = round(time.perf_counter() - t0, 1)
        appended = [
            tuple(r)
            for r in T.text_bm25_topk_indexed(spark, sf_dir, idx, query=q).collect()
        ]
        rebuilt = [
            tuple(r)
            for r in T.text_bm25_topk_indexed(spark, sf_dir, idx_rb, query=q).collect()
        ]
        s_a = spark.read.parquet(T.bm25_stats_dir(idx)).collect()[0]
        s_r = spark.read.parquet(T.bm25_stats_dir(idx_rb)).collect()[0]
        # fragment: N-1 more micro-batches, then measure the compaction
        for b in range(1, n_batches):
            T.append_bm25_index(spark, batch_docs(b), idx)

        def n_parquet_files(d: str) -> int:
            return sum(
                1
                for root, _dirs, files in os.walk(d)
                for f in files
                if f.endswith(".parquet")
            )

        files_before = n_parquet_files(T.bm25_postings_dir(idx))
        t0 = time.perf_counter()
        pre_compact = [
            tuple(r)
            for r in T.text_bm25_topk_indexed(spark, sf_dir, idx, query=q).collect()
        ]
        query_pre = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        n_files = T.compact_bm25_index(spark, idx)
        compact_wall = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        post_compact = [
            tuple(r)
            for r in T.text_bm25_topk_indexed(spark, sf_dir, idx, query=q).collect()
        ]
        query_post = round(time.perf_counter() - t0, 2)
        print(
            json.dumps(
                {
                    "op": "bm25_append",
                    "rows": args.rows,
                    "batch_docs": batch_sz,
                    "n_batches": n_batches,
                    "seed_build_sec": build,
                    "append_wall_sec": append_wall,
                    "append_shuffle_bytes": append_shuffle,
                    "rebuild_wall_sec": rebuild_wall,
                    "append_exact_vs_rebuild": appended == rebuilt
                    and tuple(s_a) == tuple(s_r),
                    "query_sec_after_20_appends": query_pre,
                    "files_before_compact": files_before,
                    "compact_wall_sec": compact_wall,
                    "compacted_files": n_files,
                    "query_sec_after_compact": query_post,
                    "compact_exact": post_compact == pre_compact,
                    "out_rows": len(appended),
                }
            )
        )
        spark.stop()
        return

    if args.op == "bm25_liststress":
        # round-14 verdict item 6: compact_bm25_index measured in the
        # regime it exists for. The local-disk adjudication showed the
        # 16 MB target is query-wall NEUTRAL at small fragment counts;
        # the claimed payoff is the object-store cost model, where the
        # driver pays per-file LIST/HEAD RPCs on every read. This probe
        # fragments a 10M-doc index with 200 micro-batch appends, then
        # measures the quantities that ARE that cost model: total
        # posting files, files inside the 3-term query's pruned
        # buckets (the per-query GET count), and the driver-side
        # listing wall of a fresh `spark.read.parquet` over the
        # posting table (InMemoryFileIndex discovery — the local floor
        # of the remote LIST round; min of 3) — each before and after
        # compaction, with pre/post query agreement pinned.
        from fledge_south_csvplayback_spark.operators import text as T

        import shutil

        n_batches = 200
        batch_sz = 2_000
        idx = f"{PROBE_ROOT}/bm25_liststress_idx_{args.rows}"
        if os.path.exists(idx):
            shutil.rmtree(idx)  # appends mutate: always start fresh

        def batch_docs(b: int) -> DataFrame:
            start = args.rows + b * batch_sz
            wc = [
                F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64(F.lit("probe"), F.col("doc_id"), F.lit(p)),
                        F.lit(VOCAB),
                    ),
                )
                for p in range(args.words)
            ]
            return (
                spark.range(start, start + batch_sz)
                .select(F.col("id").alias("doc_id"))
                .select("doc_id", F.concat_ws(" ", *wc).alias("text"))
            )

        sample = [
            r["t"]
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
            .limit(1)
            .select(F.explode(F.split("text", " ")).alias("t"))
            .limit(3)
            .collect()
        ]
        q = tuple(sample)
        t0 = time.perf_counter()
        T.build_bm25_index(spark, sf_dir, idx)
        build = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        for b in range(n_batches):
            T.append_bm25_index(spark, batch_docs(b), idx)
        appends_wall = round(time.perf_counter() - t0, 1)

        q_buckets = sorted(
            {
                r[0]
                for r in spark.range(1)
                .select(
                    F.explode(
                        F.array(*[F.lit(t) for t in q])
                    ).alias("t")
                )
                .select(F.pmod(F.xxhash64("t"), F.lit(T.BM25_INDEX_BUCKETS)))
                .collect()
            }
        )

        def file_stats(postings: str) -> tuple[int, int]:
            total = pruned = 0
            for root, _dirs, files in os.walk(postings):
                n = sum(1 for f in files if f.endswith(".parquet"))
                total += n
                if any(f"bucket={b}" in root for b in q_buckets):
                    pruned += n
            return total, pruned

        def listing_wall(postings: str) -> float:
            walls = []
            for _ in range(3):
                t = time.perf_counter()
                spark.read.parquet(postings)  # fresh file discovery
                walls.append(time.perf_counter() - t)
            return round(min(walls), 3)

        def query_wall() -> tuple[float, list]:
            walls, rows = [], []
            for _ in range(3):
                t = time.perf_counter()
                rows = [
                    tuple(r)
                    for r in T.text_bm25_topk_indexed(
                        spark, sf_dir, idx, query=q
                    ).collect()
                ]
                walls.append(time.perf_counter() - t)
            return round(min(walls), 2), rows

        postings = T.bm25_postings_dir(idx)
        files_pre, pruned_pre = file_stats(postings)
        listing_pre = listing_wall(postings)
        q_pre, rows_pre = query_wall()
        t0 = time.perf_counter()
        n_files = T.compact_bm25_index(spark, idx)
        compact_wall = round(time.perf_counter() - t0, 1)
        postings = T.bm25_postings_dir(idx)
        files_post, pruned_post = file_stats(postings)
        listing_post = listing_wall(postings)
        q_post, rows_post = query_wall()
        print(
            json.dumps(
                {
                    "op": "bm25_liststress",
                    "rows": args.rows,
                    "batch_docs": batch_sz,
                    "n_batches": n_batches,
                    "seed_build_sec": build,
                    "appends_total_sec": appends_wall,
                    "files_before_compact": files_pre,
                    "pruned_query_files_before": pruned_pre,
                    "listing_sec_before": listing_pre,
                    "query_sec_before": q_pre,
                    "compact_wall_sec": compact_wall,
                    "compacted_files": n_files,
                    "files_after_compact": files_post,
                    "pruned_query_files_after": pruned_post,
                    "listing_sec_after": listing_post,
                    "query_sec_after": q_post,
                    "compact_exact": rows_post == rows_pre,
                    "query_buckets": q_buckets,
                }
            )
        )
        spark.stop()
        return

    if args.op == "bpe":
        # round-13 verdict item 6: the BPE family's scale shape. The
        # merge LOOP is driver-side over a fixed 500-doc sample
        # (Sennrich-style; every production tokenizer trains on a
        # sample) — its corpus-proportional part is ONE TakeOrdered
        # sample fetch, not iterations×corpus scans. What scales with
        # the corpus is the APPLY pass (mapInPandas, zero shuffle).
        # Measured: train wall vs n_merges (where the driver loop
        # saturates), sample-fetch wall at 10M, and the full 10M
        # tokenize scan (wall, shuffle, docs/s).
        from fledge_south_csvplayback_spark.operators import text as T

        t0 = time.perf_counter()
        sample_texts = [
            r["text"]
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
            .orderBy("doc_id")
            .limit(T.BPE_TRAIN_DOCS)
            .select("text")
            .collect()
        ]
        fetch_sec = round(time.perf_counter() - t0, 1)
        train_curve = {}
        for n_merges in (200, 500, 1000):
            t0 = time.perf_counter()
            merges = T.bpe_train_texts(sample_texts, n_merges)
            train_curve[n_merges] = {
                "sec": round(time.perf_counter() - t0, 1),
                "merges_learned": len(merges),
            }
        merges = T.bpe_train_texts(sample_texts, 500)
        shuffle_before = shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        agg = (
            T.text_bpe_tokenize(spark, sf_dir, merges)
            .agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("n_bpe_tokens").alias("bpe_tokens"),
                F.sum("n_ws_tokens").alias("ws_tokens"),
            )
            .collect()[0]
        )
        apply_wall = round(time.perf_counter() - t0, 1)
        shuffle = shuffle_delta(shuffle_before, shuffle_write_bytes(spark))
        print(
            json.dumps(
                {
                    "op": "bpe",
                    "rows": args.rows,
                    "sample_fetch_sec": fetch_sec,
                    "train_curve": train_curve,
                    "apply_wall_sec": apply_wall,
                    "apply_shuffle_bytes": shuffle,
                    "docs_per_sec": round(args.rows / apply_wall, 1)
                    if apply_wall
                    else None,
                    "docs": agg["docs"],
                    "bpe_tokens": agg["bpe_tokens"],
                    "ws_tokens": agg["ws_tokens"],
                    "sane": agg["bpe_tokens"] >= agg["ws_tokens"],
                }
            )
        )
        spark.stop()
        return

    if args.op == "keep_best_ab":
        # A/B: min-id survivor selection (corpus_neardup_apply) vs the
        # quality-score election (corpus_neardup_keep_best), same
        # session, same corpus. Both arms pay the identical pair-mining
        # + connected-components cost; the delta is the election — one
        # codegen'd score scan, a member-sized window, and a second
        # member↔score broadcast join. The corpus gains lang/source
        # columns (the operators' output schema needs them).
        from fledge_south_csvplayback_spark.operators import curation

        aug = f"{corpus_dir(args.rows, args.words)}_ls"
        aug_path = f"{aug}/documents.parquet"
        if not os.path.exists(f"{aug_path}/_SUCCESS"):
            base = spark.read.parquet(f"{sf_dir}/documents.parquet")
            base.select(
                "doc_id",
                "text",
                F.concat(
                    F.lit("l"), F.pmod(F.xxhash64("doc_id", F.lit("L")), F.lit(5))
                ).alias("lang"),
                F.concat(
                    F.lit("src"), F.pmod(F.xxhash64("doc_id", F.lit("S")), F.lit(3))
                ).alias("source"),
            ).write.mode("overwrite").parquet(aug_path)

        arm_list = [
            ("apply_min_id", curation.corpus_neardup_apply),
            ("keep_best", curation.corpus_neardup_keep_best),
        ]
        if args.flip:
            arm_list.reverse()
        arms = {}
        for name, fn in arm_list:
            # the pair miner caches its candidate frames internally —
            # without this, arm 2 rides arm 1's cache and the A/B lies
            # (first observed as keep_best "4.8x faster")
            spark.catalog.clearCache()
            sb = shuffle_write_bytes(spark)
            t0 = time.perf_counter()
            n_surv = fn(spark, aug).count()
            arms[name] = {
                "wall_sec": round(time.perf_counter() - t0, 1),
                "shuffle_bytes": shuffle_delta(sb, shuffle_write_bytes(spark)),
                "survivors": n_surv,
            }
        k = args.rows // 1000
        print(
            json.dumps(
                {
                    "op": "keep_best_ab",
                    "rows": args.rows,
                    "gen_sec": gen_sec,
                    **{f"{n}_{k2}": v for n, d in arms.items() for k2, v in d.items()},
                    "expected_survivors": args.rows - k,
                    "survivors_equal": arms["apply_min_id"]["survivors"]
                    == arms["keep_best"]["survivors"]
                    == args.rows - k,
                }
            )
        )
        spark.stop()
        return

    builders = {
        "minhash_lsh": lambda: dedup.dedup_minhash_lsh(spark, sf_dir),
        "simhash": lambda: dedup.dedup_simhash(
            spark, sf_dir, reproducible=args.reproducible
        ),
        "simhash_blocked": lambda: dedup.dedup_simhash_blocked(
            spark, sf_dir, reproducible=args.reproducible
        ),
        "ngram_jaccard": lambda: dedup.dedup_ngram_jaccard(spark, sf_dir),
        # clusters emit (representative, dropped-member) rows, which for
        # this corpus's disjoint planted pairs IS the planted pair set
        "clusters": lambda: dedup.dedup_clusters(spark, sf_dir)
        .filter(~F.col("keep"))
        .select(F.col("cluster_id").alias("doc_a"), F.col("doc_id").alias("doc_b")),
    }

    # timer wraps the BUILDER too: dedup_minhash_lsh eagerly
    # materializes its candidate set (cands.count()) during construction
    # — measuring only the final count() would skip the heaviest jobs
    shuffle_before = shuffle_write_bytes(spark)
    t0 = time.perf_counter()
    out = builders[args.op]().select("doc_a", "doc_b").cache()
    n_out = out.count()
    wall = round(time.perf_counter() - t0, 1)
    shuffle = shuffle_delta(shuffle_before, shuffle_write_bytes(spark))

    expected = planted_pairs(spark, args.rows)
    n_expected = args.rows // 1000
    n_hit = out.join(expected, ["doc_a", "doc_b"]).count()

    print(
        json.dumps(
            {
                "op": args.op,
                "rows": args.rows,
                "words": args.words,
                "gen_sec": gen_sec,
                "wall_sec": wall,
                "docs_per_sec": round(args.rows / wall, 1) if wall else None,
                "shuffle_bytes": shuffle,
                "out_pairs": n_out,
                "planted": n_expected,
                "recall": round(n_hit / n_expected, 4) if n_expected else None,
                "false_pos": n_out - n_hit,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
