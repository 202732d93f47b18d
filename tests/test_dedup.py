"""Dedup-suite properties: LSH recall vs exact Jaccard ground truth."""

from __future__ import annotations

from fledge_south_csvplayback_spark.operators import dedup
from tests.conftest import TEST_SF_DIR


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_minhash_lsh_equals_exact_jaccard(spark):
    exact = _pairs(dedup.dedup_ngram_jaccard(spark, TEST_SF_DIR))
    lsh = _pairs(dedup.dedup_minhash_lsh(spark, TEST_SF_DIR))
    assert exact, "fixture corpus should contain planted near-duplicates"
    # verification filters false positives; banding at these similarity
    # levels (j >= 0.8, 8x4 bands) must not lose a single true pair
    assert lsh == exact


def test_simhash_finds_planted_near_dups(spark):
    exact = _pairs(dedup.dedup_ngram_jaccard(spark, TEST_SF_DIR))
    sim = _pairs(dedup.dedup_simhash(spark, TEST_SF_DIR))
    assert sim, "simhash should produce candidate near-dup pairs"
    # near-identical texts (j >= 0.8) should overwhelmingly collide in
    # simhash space; require high recall rather than exact equality
    # (simhash is a different similarity geometry)
    recall = len(sim & exact) / len(exact)
    assert recall >= 0.9, (recall, len(sim), len(exact))


def test_exact_dedup_counts(spark):
    out = dedup.dedup_exact(spark, TEST_SF_DIR)
    total = out.agg({"n_copies": "sum"}).collect()[0][0]
    assert total == 500  # every doc lands in exactly one group
