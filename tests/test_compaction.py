"""Small-files compaction: fewer files, same data, target sizing."""

from __future__ import annotations

from fledge_south_csvplayback_spark.operators import compaction
from tests.conftest import TEST_SF_DIR


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
    docs.repartition(64).write.parquet(src)  # 64 tiny files

    import os

    n_in = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_in >= 32
    n_out = compaction.compact_parquet(spark, src, out)
    assert n_out < n_in / 8  # actually compacted
    # same data, row-for-row
    a = sorted(tuple(r) for r in docs.collect())
    b = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert a == b


def test_compaction_target_sizing(spark, tmp_path):
    """Output file count tracks ceil(input_bytes / target): a tiny
    target forces multiple files, a huge one forces a single file."""
    src = str(tmp_path / "src")
    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
    docs.repartition(16).write.parquet(src)

    one = compaction.compact_parquet(
        spark, src, str(tmp_path / "one"), target_bytes=1 << 40
    )
    assert one == 1
    many = compaction.compact_parquet(
        spark, src, str(tmp_path / "many"), target_bytes=16 * 1024
    )
    assert many > 1
