"""JSONL document source: pinned-schema reads, corrupt-line audit,
round-trip, and DuckDB oracle parity on the same files."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from fledge_south_csvplayback_spark.sources import jsonl_source as J
from tests.conftest import TEST_SF_DIR
from tests.oracle_harness import compare

_LINES = [
    '{"doc_id": 0, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}',
    '{"doc_id": 1, "text": "bonjour", "lang": "fr", "source": "web", "n_chars": 7}',
    'this is not json at all',
    '{"doc_id": 3, "text": "ok", "lang": "en", "source": "book", "n_chars": 2, "extra_key": 42}',
]


def _write_fixture(tmp_path, compress=False):
    p = str(tmp_path / ("docs.jsonl.gz" if compress else "docs.jsonl"))
    data = ("\n".join(_LINES) + "\n").encode()
    if compress:
        with gzip.open(p, "wb") as f:
            f.write(data)
    else:
        with open(p, "wb") as f:
            f.write(data)
    return p


def test_jsonl_read_pinned_schema_and_corrupt_audit(spark, tmp_path):
    p = _write_fixture(tmp_path)
    df = J.read_jsonl_documents(spark, p, keep_corrupt=True)
    rows = {r.doc_id: r for r in df.collect()}
    assert rows[0].text == "hello world" and rows[0].lang == "en"
    # extra JSON keys are not materialized; known keys still parse
    assert rows[3].source == "book"
    # the malformed line survives as an all-NULL row with the raw text
    bad = [r for r in df.collect() if r._corrupt_record is not None]
    assert len(bad) == 1 and bad[0].text is None
    assert bad[0]._corrupt_record.startswith("this is not json")
    # default drops the audit column
    assert "_corrupt_record" not in J.read_jsonl_documents(spark, p).columns


def test_jsonl_corrupt_report(spark, tmp_path):
    p = _write_fixture(tmp_path)
    r = J.jsonl_corrupt_report(spark, p).collect()[0]
    assert (r.n_rows, r.n_corrupt) == (4, 1)


def test_jsonl_gzip_roundtrip_matches_parquet(spark, tmp_path):
    """documents.parquet -> write_jsonl(gzip) -> read_jsonl: identical
    rows — the corpus publish/re-ingest round-trip."""
    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
    out = str(tmp_path / "shards")
    J.write_jsonl(docs.repartition(4), out)
    assert any(f.endswith(".gz") for f in os.listdir(out))
    back = J.read_jsonl_documents(spark, out)
    a = sorted(tuple(r) for r in docs.collect())
    b = sorted(tuple(r) for r in back.select(*docs.columns).collect())
    assert a == b


def test_jsonl_oracle_parity(spark, tmp_path):
    """Spark's JSONL scan vs DuckDB read_json over the SAME gz file —
    the clean-row subset (DuckDB has no corrupt-record column; it
    skips/errors differently, so parity is on well-formed lines)."""
    clean = [l for l in _LINES if l.lstrip().startswith("{")]
    p = str(tmp_path / "clean.jsonl.gz")
    with gzip.open(p, "wb") as f:
        f.write(("\n".join(clean) + "\n").encode())
    df = J.read_jsonl_documents(spark, p)
    sql = f"""
SELECT doc_id, text, lang, source, n_chars
FROM read_json('{p}', format='newline_delimited',
    columns={{'doc_id': 'BIGINT', 'text': 'VARCHAR', 'lang': 'VARCHAR',
              'source': 'VARCHAR', 'n_chars': 'BIGINT'}})
"""
    ok, msg = compare(df, sql, str(tmp_path))
    assert ok, msg


def test_jsonl_bom_shard_directory_reader_report_agree(spark, tmp_path):
    """A directory of BOM'd shards (every file starts with a UTF-8
    BOM — the Windows-tool export shape): file-leading BOMs are
    stripped before records exist, so reader and report both see all
    rows clean; and a CONCATENATED shard (cat a.jsonl b.jsonl with
    BOMs intact) parses identically — the mid-file BOM rides the
    record and both paths tolerate exactly one (round-15 fix)."""
    import shutil

    d = tmp_path / "shards"
    d.mkdir()
    line = '{"doc_id": %d, "text": "x", "lang": "en", "source": "s", "n_chars": 1}\n'
    (d / "a.jsonl").write_text("﻿" + line % 1)
    (d / "b.jsonl").write_text("﻿" + line % 2)
    df = J.read_jsonl_documents(spark, str(d), keep_corrupt=True)
    assert sorted(r.doc_id for r in df.collect()) == [1, 2]
    assert all(r._corrupt_record is None for r in df.collect())
    rep = J.jsonl_corrupt_report(spark, str(d)).collect()[0]
    assert (rep.n_rows, rep.n_corrupt) == (2, 0)

    cat = tmp_path / "cat.jsonl"
    with open(cat, "wb") as out:
        for name in ("a.jsonl", "b.jsonl"):
            with open(d / name, "rb") as f:
                shutil.copyfileobj(f, out)
    df2 = J.read_jsonl_documents(spark, str(cat), keep_corrupt=True)
    assert sorted(r.doc_id for r in df2.collect()) == [1, 2]
    assert all(r._corrupt_record is None for r in df2.collect())
    rep2 = J.jsonl_corrupt_report(spark, str(cat)).collect()[0]
    assert (rep2.n_rows, rep2.n_corrupt) == (2, 0)


def test_jsonl_zst_member_reads_natively(spark, tmp_path):
    """The docstring's third codec claim, pinned: a ``.zst`` shard
    decodes in the scan (Hadoop ZStandardCodec; pyarrow's zstd frame
    is the same format corpora ship — e.g. RedPajama/Dolma releases).
    Mixed-codec directories read member-by-member like the CSV layer."""
    import pyarrow as pa

    d = tmp_path / "zshards"
    d.mkdir()
    line = '{"doc_id": %d, "text": "x", "lang": "en", "source": "s", "n_chars": 1}\n'
    (d / "a.jsonl.zst").write_bytes(
        pa.compress((line % 1).encode(), codec="zstd", asbytes=True)
    )
    import gzip

    (d / "b.jsonl.gz").write_bytes(gzip.compress((line % 2).encode()))
    (d / "c.jsonl").write_text(line % 3)
    df = J.read_jsonl_documents(spark, str(d), keep_corrupt=True)
    assert sorted(r.doc_id for r in df.collect()) == [1, 2, 3]
    assert all(r._corrupt_record is None for r in df.collect())
    rep = J.jsonl_corrupt_report(spark, str(d)).collect()[0]
    assert (rep.n_rows, rep.n_corrupt) == (3, 0)


def test_jsonl_corrupt_report_by_file(spark, tmp_path):
    """by_file=True names the bad shard: same scan and classification
    as the global report, one row per input file, so the two reports
    must agree in aggregate and the corrupt counts must land on the
    files that actually carry the corruption."""
    d = tmp_path / "shards"
    d.mkdir()
    line = '{"doc_id": %d, "text": "x", "lang": "en", "source": "s", "n_chars": 1}\n'
    (d / "good.jsonl").write_text(line % 1 + line % 2)
    (d / "bad.jsonl").write_text(line % 3 + '{"doc_id": 4, "text": "tr\n' + "﻿\n")
    (d / "empty_ish.jsonl").write_text("\n \t \n")
    per = {
        r.file.rsplit("/", 1)[-1]: (r.n_rows, r.n_corrupt)
        for r in J.jsonl_corrupt_report(spark, str(d), by_file=True).collect()
    }
    assert per == {
        "good.jsonl": (2, 0),
        "bad.jsonl": (3, 2),
    }  # the blank-only shard contributes no row at all
    tot = J.jsonl_corrupt_report(spark, str(d)).collect()[0]
    assert (tot.n_rows, tot.n_corrupt) == (5, 2)
