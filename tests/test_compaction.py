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


def test_compaction_preserves_hive_partitioning(spark, tmp_path):
    """Regression (round-5 review finding): compacting a
    partitionBy layout must PRESERVE it — flattening silently costs
    every downstream reader its partition pruning — and must not
    explode into n×|values| fragments (the pre-write repartition keys
    on the partition columns)."""
    import os

    src = str(tmp_path / "part_src")
    out = str(tmp_path / "part_out")
    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
    docs.repartition(16).write.partitionBy("lang").parquet(src)
    assert compaction.partition_cols(src) == ["lang"]

    compaction.compact_parquet(spark, src, out)
    langs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert langs == {
        f"lang={r.lang}" for r in docs.select("lang").distinct().collect()
    }
    # one file per partition value (keyed repartition), not fragments
    for d in langs:
        files = [
            f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)
    # pruning works on the compacted layout
    plan = (
        spark.read.parquet(out)
        .filter("lang = 'en'")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    # same rows
    a = sorted(tuple(r) for r in docs.select("doc_id", "lang").collect())
    b = sorted(
        tuple(r)
        for r in spark.read.parquet(out).select("doc_id", "lang").collect()
    )
    assert a == b
