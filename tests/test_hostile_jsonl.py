"""Hostile-JSONL sweep — the round-12 fixture-envelope pass for the
one document source the CSV sweep doesn't cover.

JSONL is an engine extension (no reference engine to diff against —
SURVEY §2 ABSENT), so the check pins OUR permissive semantics exactly,
line class by line class, plus the reader/report consistency contract:
``jsonl_corrupt_report``'s (n_rows, n_corrupt) must describe what
``read_jsonl_documents`` actually yields (same parser, same blank-line
skip, same corrupt classification).
"""

from __future__ import annotations

import pytest

from fledge_south_csvplayback_spark.sources import jsonl_source as J

# (name, line, expected) — expected is a dict of the data columns the
# row should carry, "corrupt" for a full-NULL quarantined row,
# "corrupt_partial" when the bad FIELD nulls out but the rest of the
# row (and the audit line) survive, or None for no row at all.
CASES = [
    (
        "clean",
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}',
        {"doc_id": 1, "text": "ok", "corrupt": False},
    ),
    ("truncated", '{"doc_id": 2, "text": "trunc', "corrupt"),
    (
        "string_for_long",
        '{"doc_id": "3", "text": "str id", "lang": "en", "source": "s", "n_chars": 6}',
        {"doc_id": None, "text": "str id", "corrupt": True},
    ),
    (
        "float_for_long",
        '{"doc_id": 4.7, "text": "float id", "lang": "en", "source": "s", "n_chars": 8}',
        {"doc_id": None, "text": "float id", "corrupt": True},
    ),
    (
        "object_for_string",
        '{"doc_id": 5, "text": {"nested": true}, "lang": "en", "source": "s", "n_chars": 1}',
        {"doc_id": 5, "text": '{"nested": true}', "corrupt": False},
    ),
    (
        "duplicate_key_last_wins",
        '{"doc_id": 6, "doc_id": 7, "text": "dup", "lang": "en", "source": "s", "n_chars": 3}',
        {"doc_id": 7, "text": "dup", "corrupt": False},
    ),
    (
        "explicit_nulls",
        '{"doc_id": 8, "text": null, "lang": null, "source": "s", "n_chars": null}',
        {"doc_id": 8, "text": None, "corrupt": False},
    ),
    ("blank_line", "", None),
    ("whitespace_only_line", " \t ", None),
    # vertical tab is NOT JSON whitespace: a VT-only line is a corrupt
    # ROW to Jackson (round-12 review: a \S-based report filter
    # silently dropped it from the health check)
    ("vertical_tab_only_line", "\x0b", "corrupt"),
    (
        "long_overflow",
        '{"doc_id": 1000000000000000000000000, "text": "big", "lang": "en", "source": "s", "n_chars": 3}',
        {"doc_id": None, "text": "big", "corrupt": True},
    ),
    (
        "missing_and_extra_keys",
        '{"text": "no id", "lang": "en", "source": "s", "n_chars": 5, "extra": 42}',
        {"doc_id": None, "text": "no id", "corrupt": False},
    ),
    ("non_object", "[1,2,3]", "corrupt"),
    (
        "surrogate_pair_escape",
        '{"doc_id": 12, "text": "uni \\ud83d\\ude00", "lang": "en", "source": "s", "n_chars": 5}',
        {"doc_id": 12, "text": "uni \U0001f600", "corrupt": False},
    ),
    # round-15 per-RECORD BOM cells (the cat-of-BOM'd-shards shape):
    # Jackson's byte-source bootstrapper skips exactly ONE leading BOM
    # per record, so a MID-FILE BOM'd line is clean — and the report's
    # from_json path must agree (it re-strips the BOM itself; the hunt
    # found it classifying every such line corrupt). Degenerate cells:
    # a record of JUST a BOM is corrupt (3 bytes — the 4-byte encoding
    # sniff can't complete), BOM + space/tab-only is no row, a second
    # BOM or whitespace BEFORE the BOM is corrupt. No \r in any cell:
    # bare \r is a line TERMINATOR to Hadoop line reading, never
    # record content.
    (
        "bom_then_json",
        '﻿{"doc_id": 20, "text": "bom", "lang": "en", "source": "s", "n_chars": 3}',
        {"doc_id": 20, "text": "bom", "corrupt": False},
    ),
    (
        "bom_then_ws_then_json",
        '﻿  {"doc_id": 21, "text": "bomws", "lang": "en", "source": "s", "n_chars": 5}',
        {"doc_id": 21, "text": "bomws", "corrupt": False},
    ),
    ("bom_only", "﻿", "corrupt"),
    ("bom_space_only", "﻿ ", None),
    ("bom_tab_only", "﻿\t", None),
    (
        "double_bom",
        '﻿﻿{"doc_id": 22, "text": "x", "lang": "en", "source": "s", "n_chars": 1}',
        "corrupt",
    ),
    (
        "ws_then_bom",
        ' ﻿{"doc_id": 23, "text": "x", "lang": "en", "source": "s", "n_chars": 1}',
        "corrupt",
    ),
]


@pytest.fixture(scope="module")
def hostile_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("jsonl") / "hostile.jsonl"
    # UTF-8 BOM at file start: tolerated by reader AND report
    p.write_text("﻿" + "\n".join(line for _, line, *_ in CASES) + "\n")
    return str(p)


def _rows_by_line(spark, hostile_path):
    df = J.read_jsonl_documents(spark, hostile_path, keep_corrupt=True)
    return df.collect()


def test_hostile_jsonl_line_classes(spark, hostile_path):
    rows = _rows_by_line(spark, hostile_path)
    # blank line yields no row: one row per non-blank case, in order
    expected_cases = [(n, l, e) for n, l, e in CASES if e is not None]
    assert len(rows) == len(expected_cases)
    for (name, line, exp), r in zip(expected_cases, rows):
        if exp == "corrupt":
            assert r.doc_id is None and r.text is None, name
            assert r._corrupt_record == line, name
            continue
        assert r.doc_id == exp["doc_id"], name
        assert r.text == exp["text"], name
        if exp["corrupt"]:
            assert r._corrupt_record == line, name
        else:
            assert r._corrupt_record is None, name


def test_hostile_jsonl_report_matches_reader(spark, hostile_path):
    """(n_rows, n_corrupt) must describe the reader's actual output:
    blank lines are no rows to either, and every line the reader
    flags (full-NULL OR partial with audit) is one corrupt count."""
    rows = _rows_by_line(spark, hostile_path)
    rep = J.jsonl_corrupt_report(spark, hostile_path).collect()[0]
    assert rep.n_rows == len(rows)
    assert rep.n_corrupt == sum(r._corrupt_record is not None for r in rows)


def test_hostile_jsonl_failfast_raises(spark, hostile_path):
    with pytest.raises(Exception):
        J.read_jsonl_documents(spark, hostile_path, mode="FAILFAST").collect()


def test_clean_file_report_is_zero_corrupt(spark, tmp_path):
    p = str(tmp_path / "clean.jsonl")
    with open(p, "w") as f:
        for i in range(10):
            f.write(
                f'{{"doc_id": {i}, "text": "t{i}", "lang": "en", '
                f'"source": "s", "n_chars": 2}}\n'
            )
        f.write("\n")  # trailing blank: still zero rows of noise
    rep = J.jsonl_corrupt_report(spark, p).collect()[0]
    assert (rep.n_rows, rep.n_corrupt) == (10, 0)
    assert J.read_jsonl_documents(spark, p).count() == 10


def test_bom_cells_inside_gz_shard_reader_report_agree(spark, tmp_path):
    """The BOM envelope under a codec: a gz shard whose decompressed
    stream carries a file-leading BOM, mid-file BOM'd clean lines, a
    BOM'd garbage line, and a BOM-only line. Decompression happens
    before line splitting in both paths, so every classification
    matches the plain-text cells — and the corrupt audit lines retain
    their BOM (the raw record, not the stripped parse input)."""
    import gzip

    line = '{"doc_id": %d, "text": "x", "lang": "en", "source": "s", "n_chars": 1}'
    body = (
        "﻿" + line % 1 + "\n"
        "﻿" + line % 2 + "\n"
        "﻿notjson\n"
        "﻿\n" + line % 3 + "\n"
    )
    p = tmp_path / "a.jsonl.gz"
    p.write_bytes(gzip.compress(body.encode()))
    rows = J.read_jsonl_documents(spark, str(p), keep_corrupt=True).collect()
    assert sorted(r.doc_id for r in rows if r.doc_id is not None) == [1, 2, 3]
    bad = sorted(r._corrupt_record for r in rows if r._corrupt_record)
    assert bad == ["﻿", "﻿notjson"]
    rep = J.jsonl_corrupt_report(spark, str(p)).collect()[0]
    assert (rep.n_rows, rep.n_corrupt) == (5, 2)
