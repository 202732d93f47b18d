"""Winnowing fingerprint: oracle parity + the MOSS containment
guarantee on the fixture corpus.

This operator lives outside the driver registry (capped at 50
entries), so its DuckDB oracle runs here with the same compare the
driver uses.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fledge_south_csvplayback_spark.operators import dedup, text
from tests.conftest import TEST_SF_DIR
from tests.oracle_harness import compare


def test_winnow_oracle_parity(spark):
    df = text.winnow_fingerprint(spark, TEST_SF_DIR)
    ok, msg = compare(df, text.WINNOW_FINGERPRINT_SQL, TEST_SF_DIR)
    assert ok, msg


def test_winnow_near_dups_share_fingerprints(spark):
    """Winnowing guarantees any shared token run of length >= N+W-1
    yields a shared fingerprint; the fixture's planted near-dup pairs
    (Jaccard >= 0.8) share long runs, so every such pair must overlap
    in fingerprint space — and random pairs must not collide much."""
    fp = text.winnow_fingerprint(spark, TEST_SF_DIR)
    by_doc = {
        r["doc_id"]: set(r["fps"])
        for r in fp.groupBy("doc_id")
        .agg(F.collect_set("fp").alias("fps"))
        .collect()
    }
    pairs = dedup.dedup_ngram_jaccard(spark, TEST_SF_DIR).collect()
    assert pairs
    for r in pairs:
        a, b = by_doc[r.doc_a], by_doc[r.doc_b]
        overlap = len(a & b) / min(len(a), len(b))
        assert overlap >= 0.5, (r.doc_a, r.doc_b, overlap)


def test_winnow_is_sparser_than_shingling(spark):
    """The point of winnowing: ~1/W the index size of full shingling."""
    n_fp = text.winnow_fingerprint(spark, TEST_SF_DIR).count()
    n_sh = dedup._shingled(spark, TEST_SF_DIR).select(F.explode("sh")).count()
    assert n_fp < n_sh * 0.6, (n_fp, n_sh)
