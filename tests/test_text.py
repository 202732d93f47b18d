"""Standalone text normalization: oracle parity, planted rules,
corpus-wide idempotence."""

from __future__ import annotations

from fledge_south_csvplayback_spark.operators import text



# --- standalone normalization ---------------------------------------------
def test_text_normalize_oracle_parity(spark):
    from tests.conftest import ORACLE_SF_DIR, TEST_SF_DIR
    from tests.oracle_harness import compare

    for sf in (TEST_SF_DIR, ORACLE_SF_DIR):
        ok, msg = compare(
            text.text_normalize(spark, sf), text.TEXT_NORMALIZE_SQL, sf
        )
        assert ok, msg


def test_text_normalize_planted_and_idempotent(spark, tmp_path):
    """Every rule class exercised on planted text; corpus-wide
    idempotence: normalize(normalize(x)) == normalize(x)."""
    from tests.conftest import TEST_SF_DIR

    import pyspark.sql.functions as F

    sf_dir = str(tmp_path)
    planted = (
        "“Sm‘art’ — dash”​\tand\x07  "
        "CONTROL\nlines﻿"
    )
    spark.createDataFrame(
        [(1, planted, "en", "s", 1), (2, "already clean", "en", "s", 1),
         (3, None, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    rows = {r.doc_id: r for r in text.text_normalize(spark, sf_dir).collect()}
    assert rows[1].norm_text == '"sm\'art\' - dash" and control lines'
    assert rows[1].changed
    assert rows[2].norm_text == "already clean" and not rows[2].changed
    assert rows[3].norm_text is None and not rows[3].changed
    # idempotence over the real corpus: re-normalizing changes nothing
    once = text.text_normalize(spark, TEST_SF_DIR)
    twice = once.select(
        "doc_id", text.normalize_expr(F.col("norm_text")).alias("again"),
        "norm_text",
    )
    assert twice.filter(~F.col("again").eqNullSafe(F.col("norm_text"))).count() == 0
