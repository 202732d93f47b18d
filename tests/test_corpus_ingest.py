"""Streaming corpus ingest: stream==batch equivalence, cross-batch
dedup state, idempotent replay layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from fledge_south_csvplayback_spark.operators import curation
from fledge_south_csvplayback_spark.streaming import corpus_ingest as CI
from tests.conftest import TEST_SF_DIR


def _run(spark, tmp_path, n_chunks=4):
    src = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
    docs.repartition(n_chunks).write.parquet(src)
    q = CI.stream_curate_corpus(spark, src, out, ckpt)
    q.awaitTermination()
    return out, docs


def test_stream_ingest_equals_batch_pipeline(spark, tmp_path):
    """The accepted corpus == the batch quality∘exact-dedup pipeline,
    modulo keeper identity: accepted FINGERPRINT set and row count are
    arrival-order-independent and must match the batch keeper set
    exactly; every accepted doc passes quality; no fingerprint is
    accepted twice across batches."""
    out, docs = _run(spark, tmp_path)
    got = spark.read.parquet(f"{out}/corpus")

    keep = curation.quality_filter(spark, TEST_SF_DIR).filter(F.col("keep"))
    batch_keepers = curation._keep_first_per_fingerprint(
        docs.join(keep.select("doc_id"), "doc_id")
    )
    want_fps = {r.fingerprint for r in batch_keepers.collect()}
    got_fps = [r.fingerprint for r in got.select("fingerprint").collect()]
    assert set(got_fps) == want_fps
    assert len(got_fps) == len(want_fps)  # no fingerprint accepted twice
    # every accepted doc passes the quality gate
    kept_ids = {r.doc_id for r in keep.collect()}
    assert {r.doc_id for r in got.collect()} <= kept_ids
    # state table mirrors the corpus
    fps_state = {
        r.fingerprint
        for r in spark.read.parquet(f"{out}/fingerprints").collect()
    }
    assert fps_state == want_fps


def test_stream_ingest_batches_partition_lineage(spark, tmp_path):
    """Outputs land under ingest_batch=N (the idempotent-replay and
    lineage layout), with more than one batch actually exercised."""
    import os

    out, _ = _run(spark, tmp_path, n_chunks=4)
    batches = {
        d
        for d in os.listdir(f"{out}/corpus")
        if d.startswith("ingest_batch=")
    }
    assert len(batches) >= 2, batches
    # reading with partition discovery exposes the lineage column
    got = spark.read.parquet(f"{out}/corpus")
    assert "ingest_batch" in got.columns


def test_stream_ingest_resume_processes_only_new_files(spark, tmp_path):
    """Restarting the stream with the same checkpoint after new shards
    land processes ONLY the new files, and cross-run dedup state still
    applies (a duplicate of an already-accepted doc is rejected)."""
    src = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
    docs.coalesce(1).write.parquet(src)
    CI.stream_curate_corpus(spark, src, out, ckpt).awaitTermination()
    n_first = spark.read.parquet(f"{out}/corpus").count()

    # land one new shard: a fresh quality-passing doc + a dup of doc 0
    base = docs.orderBy("doc_id").limit(1).collect()[0]
    new = spark.createDataFrame(
        [
            (990001, " ".join(f"fresh{i:02d}" for i in range(30)), "en", "web", 0),
            (990002, base.text, base.lang, base.source, base.n_chars),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    new.coalesce(1).write.mode("append").parquet(src)
    CI.stream_curate_corpus(spark, src, out, ckpt).awaitTermination()
    after = spark.read.parquet(f"{out}/corpus")
    assert after.count() == n_first + 1  # fresh accepted, dup rejected
    assert after.filter(F.col("doc_id") == 990001).count() == 1
    assert after.filter(F.col("doc_id") == 990002).count() == 0


def test_accept_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering a batch AFTER its
    previous attempt committed both writes (the crash-before-
    checkpoint window) must rewrite identical outputs — review
    finding: the state read used to include the batch's own
    fingerprints, so the replay anti-joined itself away and OVERWROTE
    the batch with empty data."""
    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet").limit(50)
    out = str(tmp_path / "out")
    CI.accept_batch(docs, 0, out)
    first = sorted(
        tuple(r) for r in spark.read.parquet(f"{out}/corpus").collect()
    )
    assert first  # something was accepted
    CI.accept_batch(docs, 0, out)  # re-delivery of the SAME batch id
    replayed = sorted(
        tuple(r) for r in spark.read.parquet(f"{out}/corpus").collect()
    )
    assert replayed == first
    # and a genuinely NEW batch still dedups against batch 0's state
    CI.accept_batch(docs, 1, out)
    b1 = spark.read.parquet(f"{out}/corpus").filter("ingest_batch = 1")
    assert b1.count() == 0  # all fingerprints already accepted
