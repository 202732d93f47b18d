"""Streaming media near-dup ingest: stream==full-miner equivalence,
index-state growth across batches, idempotent replay."""

from __future__ import annotations

import os

from fledge_south_csvplayback_spark.operators import multimodal as M
from fledge_south_csvplayback_spark.streaming import media_ingest as MI


def _md5hex16(i, salt=""):
    import hashlib

    return hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:16]


def _flip_bits(hex16, bits):
    v = int(hex16, 16)
    for b in bits:
        v ^= 1 << b
    return f"{v:016x}"


def _fixture(spark):
    """Corpus [0,300) + two landing shards [300,350) and [350,400)
    with planted cross- and within-shard near-dups; returns
    (corpus_st, shard_frames, full_hash_dict)."""
    hashes = {i: _md5hex16(i, "s") for i in range(400)}
    hashes[320] = _flip_bits(hashes[5], [3])      # corpus x shard1
    hashes[330] = _flip_bits(hashes[321], [7, 9])  # within shard1
    hashes[360] = _flip_bits(hashes[320], [11])   # shard1 x shard2
    hashes[399] = _flip_bits(hashes[8], [2, 40])  # corpus x shard2
    def frame(lo, hi):
        return spark.createDataFrame(
            [(i, hashes[i]) for i in range(lo, hi)],
            "doc_id long, dhash string",
        )
    return frame(0, 300), [frame(300, 350), frame(350, 400)], hashes


def _full_pairs(spark, hashes, max_doc):
    st = spark.createDataFrame(
        [(i, h) for i, h in hashes.items() if i < max_doc],
        "doc_id long, dhash string",
    )
    return {
        (r.doc_a, r.doc_b, r.hamming)
        for r in M.image_neardup_pairs(spark, "unused", stats=st).collect()
    }


def test_stream_media_neardup_matches_sequential_full_miner(
    spark, tmp_path
):
    """Each batch's pair output == the full miner over everything
    accepted up to and including that batch, restricted to
    batch-touching pairs — the sequential acceptance semantics; the
    shard1 x shard2 pair exists only because shard1's acceptance
    advanced the index."""
    corpus, shards, hashes = _fixture(spark)
    src = str(tmp_path / "landing")
    idx = str(tmp_path / "index")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # one file per shard so maxFilesPerTrigger=1 == one batch per shard
    for k, sh in enumerate(shards):
        sh.coalesce(1).write.mode("append" if k else "overwrite").parquet(
            src
        )
    MI.seed_media_index(spark, corpus, idx)
    MI.stream_media_neardup(spark, src, idx, out, ckpt).awaitTermination()
    batches = sorted(
        int(d.split("=")[1])
        for d in os.listdir(f"{out}/pairs")
        if d.startswith("ingest_batch=")
    )
    assert len(batches) == 2
    got_all = set()
    seen_ranges = [(300, 350), (350, 400)]
    # batch file order is lexicographic over landing files; recover
    # which shard each batch held from its doc ids
    for b in batches:
        rows = spark.read.parquet(
            f"{out}/pairs/ingest_batch={b}"
        ).collect()
        got = {(r.doc_a, r.doc_b, r.hamming) for r in rows}
        got_all |= got
    full = _full_pairs(spark, hashes, 400)
    want = {p for p in full if p[0] >= 300 or p[1] >= 300}
    assert got_all == want
    assert {(5, 320, 1), (321, 330, 2), (320, 360, 1), (8, 399, 2)} <= (
        got_all
    )
    # index state grew: seed partition + one per accepted batch
    parts = {
        d
        for d in os.listdir(f"{idx}/bands")
        if d.startswith("ingest_batch=")
    }
    assert parts == {"ingest_batch=-1", "ingest_batch=0", "ingest_batch=1"}


def test_media_accept_batch_replay_idempotent(spark, tmp_path):
    """Re-delivering a batch whose previous attempt already committed
    its band rows must produce IDENTICAL outputs: the index read
    excludes the batch's own partition, so the batch never probes
    itself (which would duplicate every within-batch pair as a cross
    pair)."""
    corpus, shards, _ = _fixture(spark)
    idx = str(tmp_path / "index")
    out = str(tmp_path / "out")
    MI.seed_media_index(spark, corpus, idx)
    MI.media_accept_batch(shards[0], 0, idx, out)
    first = {
        tuple(r)
        for r in spark.read.parquet(
            f"{out}/pairs/ingest_batch=0"
        ).collect()
    }
    assert first  # planted pairs present
    MI.media_accept_batch(shards[0], 0, idx, out)  # re-delivery
    again = {
        tuple(r)
        for r in spark.read.parquet(
            f"{out}/pairs/ingest_batch=0"
        ).collect()
    }
    assert again == first


def test_media_accept_batch_per_doc_min(spark, tmp_path):
    """Multi-fingerprint sources (video frame rows): per_doc_min
    collapses a doc pair matched by several frame pairs to ONE row at
    min Hamming — the batch op's video semantics, reachable from the
    stream."""
    corpus_rows = [(d, _md5hex16(d * 10 + f, "v")) for d in range(50)
                   for f in range(3)]
    batch_rows = [(100, _md5hex16(7 * 10 + 0, "v")),        # == doc7 f0
                  (100, _flip_bits(_md5hex16(7 * 10 + 1, "v"), [5])),
                  (100, _md5hex16(9991, "vx"))]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, dhash string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, dhash string")
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    MI.seed_media_index(spark, corpus, idx)
    MI.media_accept_batch(batch, 0, idx, out, per_doc_min=True)
    rows = spark.read.parquet(f"{out}/pairs/ingest_batch=0").collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    assert got[(7, 100)] == 0          # min over the two frame matches
    assert len([k for k in got if k == (7, 100)]) == 1


def test_media_ingest_metrics_partitions(spark, tmp_path):
    """Each accepted batch writes a one-row metrics partition that
    reconciles with its outputs and rewrites identically on replay."""
    corpus, shards, _ = _fixture(spark)
    idx = str(tmp_path / "index")
    out = str(tmp_path / "out")
    MI.seed_media_index(spark, corpus, idx)
    MI.media_accept_batch(shards[0], 0, idx, out)
    m = spark.read.parquet(f"{out}/metrics/ingest_batch=0").collect()
    assert len(m) == 1
    r = m[0]
    assert r.n_input == shards[0].count()
    assert r.n_pairs == spark.read.parquet(
        f"{out}/pairs/ingest_batch=0"
    ).count()
    MI.media_accept_batch(shards[0], 0, idx, out)  # replay
    m2 = spark.read.parquet(f"{out}/metrics/ingest_batch=0").collect()
    assert len(m2) == 1 and tuple(m2[0]) == tuple(r)


def test_compact_media_index_folds_and_preserves_semantics(spark, tmp_path):
    """compact_media_index (round-14, the media twin of the text df
    compactor): folding accepted band partitions into the seed must be
    observationally invisible — the NEXT batch's pairs over a compacted
    index equal those over the partitioned one — while the probe's
    read drops from N per-batch directories to one merged partition.
    Also pins the versioned-promote lifecycle: crash leftovers ignored
    and swept, the superseded literal dir surviving exactly one cycle,
    replay of a post-compact batch still idempotent."""
    corpus, shards, hashes = _fixture(spark)
    pairs1 = {}
    for tag in ("cmp", "raw"):
        idx = str(tmp_path / f"idx_{tag}")
        out = str(tmp_path / f"out_{tag}")
        MI.seed_media_index(spark, corpus, idx)
        MI.media_accept_batch(shards[0], 0, idx, out)
        if tag == "cmp":
            rows_before = {
                (r.doc_id, r.tbl, r.kk)
                for r in spark.read.parquet(MI.media_bands_dir(idx))
                .select("doc_id", "tbl", "kk")
                .collect()
            }
            # crash leftovers: a staged-but-unpromoted version and an
            # orphaned tmp manifest must be invisible and swept
            spark.createDataFrame(
                [(0,)], "x long"
            ).write.parquet(f"{idx}/bands.v9/ingest_batch=-1")
            with open(f"{idx}/bands_MANIFEST.tmp", "w") as f:
                f.write("bands.v9")
            assert os.path.basename(MI.media_bands_dir(idx)) == "bands"
            MI.compact_media_index(spark, idx)
            assert not os.path.exists(f"{idx}/bands.v9")
            assert not os.path.exists(f"{idx}/bands_MANIFEST.tmp")
            cur = MI.media_bands_dir(idx)
            assert os.path.basename(cur) == "bands.v1"
            parts = {
                p for p in os.listdir(cur) if p.startswith("ingest_batch=")
            }
            assert parts == {"ingest_batch=-1"}  # folded to one partition
            # the fold is row-identical (a union, not an aggregation)
            rows_after = {
                (r.doc_id, r.tbl, r.kk)
                for r in spark.read.parquet(cur)
                .select("doc_id", "tbl", "kk")
                .collect()
            }
            assert rows_after == rows_before
            # read stability: the superseded literal dir survives THIS
            # promote...
            assert os.path.isdir(f"{idx}/bands")
        MI.media_accept_batch(shards[1], 1, idx, out)
        pairs1[tag] = {
            tuple(r)
            for r in spark.read.parquet(
                f"{out}/pairs/ingest_batch=1"
            ).collect()
        }
    # folding changed nothing observable, and the cross pair that needs
    # shard1's accepted state (360 x 320) is present in both
    assert pairs1["cmp"] == pairs1["raw"] and pairs1["cmp"]
    assert any(a == 320 or b == 320 for a, b, _h in pairs1["cmp"])
    # post-compact replay is still idempotent (batch 1 is NOT folded,
    # so the exclusion filter still prunes its own rows)
    idx, out = str(tmp_path / "idx_cmp"), str(tmp_path / "out_cmp")
    MI.media_accept_batch(shards[1], 1, idx, out)
    again = {
        tuple(r)
        for r in spark.read.parquet(f"{out}/pairs/ingest_batch=1").collect()
    }
    assert again == pairs1["cmp"]
    # a second compact folds batch 1, sweeps the superseded literal dir
    MI.compact_media_index(spark, idx)
    assert os.path.basename(MI.media_bands_dir(idx)) == "bands.v2"
    assert not os.path.exists(f"{idx}/bands")
    assert os.path.isdir(f"{idx}/bands.v1")  # deferred one more cycle
    # and re-seeding a compacted index fails loudly
    import pytest

    with pytest.raises(ValueError, match="fresh directory"):
        MI.seed_media_index(spark, corpus, idx)
