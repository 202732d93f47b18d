"""Hostile-CSV sweep over the CSV scan variants vs pandas — the
reference's actual engine (round-11 verdict item 2).

Round 11 closed the hostile-input class for documents/embeddings/events;
this closes it for the one remaining data-bearing surface: the four S3
scan variants (reference csvplayback.py:556-673), ± skip-rows. Each
hostile feature (quoted commas, doubled quotes, CRLF, UTF-8 BOM,
trailing commas, blank lines, bad numerics, short/long rows) is read by
BOTH engines; a divergence either got fixed (BOM strip + blank-line
drops + pandas header indexing in lineio, round 12) or is pinned here
with the documented rationale:

- rows WIDER than the header: Spark's PERMISSIVE mode drops the extra
  fields; pandas instead reinterprets the whole file with the first
  column as an INDEX (a pandas inference quirk, not a field-parsing
  semantic). Asserted as the documented Spark behavior, not matched.
- empty header cells: the native no-inference path keeps Spark's
  ``_c<i>`` naming; every path that derives names from the header line
  (inference, skip-rows, explicit) uses pandas' ``Unnamed: <i>``.
  Values agree everywhere; only the no-inference fallback name differs.
"""

from __future__ import annotations

import csv
import os

import pandas as pd
import pytest

from fledge_south_csvplayback_spark.sources import csv_source as cs

# name -> (file text, width). Written with newline='' so CRLF survives.
CASES = {
    "quoted": ('a,b,c\n1,"x,y",3\n"he said ""hi""",2,"z"\n', 3),
    "doubled_quotes": ('a,b\n"q""q",2\n"""lead",4\n', 2),
    "crlf": ("a,b,c\r\n1,2,3\r\n4,5,6\r\n", 3),
    "bom": ("﻿a,b,c\n1,2,3\n4,5,6\n", 3),
    "trailing_comma": ("a,b,c,\n1,2,3,\n4,5,6,\n", 4),
    "blank_lines": ("a,b,c\n1,2,3\n\n4,5,6\n\n", 3),
    "bad_numeric": ("a,b\n1,2\nxx,3\n4,yy\n", 2),
    "short_rows": ("a,b,c\n1,2\n3\n4,5,6\n", 3),
    "long_rows": ("a,b,c\n1,2,3,4\n5,6,7\n", 3),
    "whitespace_cells": ("a,b\n ,2\n3, \n", 2),
}
# pandas reinterprets wider-than-header rows via index promotion; the
# Spark engines keep the declared columns and drop the extras.
PANDAS_INDEX_QUIRK = {"long_rows"}

SKIP_META = "meta0,m\nmeta1\n"  # 2 physical lines ahead of the body


def _write(tmp_path, name, text):
    p = str(tmp_path / f"{name}.csv")
    with open(p, "w", newline="") as f:
        f.write(text)
    return p


def _norm_pd(df) -> list[tuple]:
    rows = [
        tuple(None if pd.isna(v) else str(v) for v in row)
        for row in df.itertuples(index=False)
    ]
    return sorted(rows, key=repr)


def _norm_spark(df) -> list[tuple]:
    rows = [tuple(r) for r in df.collect()]
    return sorted(rows, key=repr)


# --- variant 1: plain pick_from_file (native reader) -------------------------
@pytest.mark.parametrize("case", sorted(CASES))
def test_pick_plain_vs_pandas(spark, tmp_path, case):
    text, width = CASES[case]
    p = _write(tmp_path, case, text)
    df = cs.read_pick_from_file(spark, p, infer_schema=False)
    if case in PANDAS_INDEX_QUIRK:
        assert _norm_spark(df) == sorted(
            [("1", "2", "3"), ("5", "6", "7")], key=repr
        )
        return
    exp = pd.read_csv(p, dtype=str)
    assert _norm_spark(df) == _norm_pd(exp), case
    assert len(df.columns) == len(exp.columns) == width


# --- variant 1b: inference path derives pandas-consistent names --------------
@pytest.mark.parametrize("case", ["trailing_comma", "bom", "bad_numeric"])
def test_pick_inferred_names_match_pandas(spark, tmp_path, case):
    text, _ = CASES[case]
    p = _write(tmp_path, case, text)
    df = cs.read_pick_from_file(spark, p)  # driver-side inference path
    exp = pd.read_csv(p, dtype=str)
    assert df.columns == list(exp.columns), case


# --- variant 2: skip-rows + header-at-index (lineio path) --------------------
@pytest.mark.parametrize("case", sorted(CASES))
def test_pick_skiprows_vs_pandas(spark, tmp_path, case):
    text, _ = CASES[case]
    if case == "bom":
        text = "﻿" + SKIP_META + text.lstrip("﻿")
    else:
        text = SKIP_META + text
    p = _write(tmp_path, f"skip_{case}", text)
    df = cs.read_pick_from_file(spark, p, skip_rows=2, infer_schema=False)
    if case in PANDAS_INDEX_QUIRK:
        assert _norm_spark(df) == sorted(
            [("1", "2", "3"), ("5", "6", "7")], key=repr
        )
        return
    exp = pd.read_csv(p, skiprows=2, header=0, dtype=str)
    assert _norm_spark(df) == _norm_pd(exp), case
    assert df.columns == list(exp.columns), case


# --- variant 3: explicit useColumns (rename+cast+usecols) --------------------
@pytest.mark.parametrize("case", sorted(CASES))
def test_explicit_vs_pandas(spark, tmp_path, case):
    text, width = CASES[case]
    p = _write(tmp_path, case, text)
    names = [f"n{i}" for i in range(width)]
    df = cs.read_explicit(spark, p, ",".join(f"{n}:str" for n in names))
    if case in PANDAS_INDEX_QUIRK:
        assert _norm_spark(df) == sorted(
            [("1", "2", "3"), ("5", "6", "7")], key=repr
        )
        return
    exp = pd.read_csv(p, header=0, names=names, dtype=str)
    assert _norm_spark(df) == _norm_pd(exp), case
    assert df.columns == names


# --- variant 3b: explicit + skip-rows (the lineio parse path) ----------------
@pytest.mark.parametrize("case", sorted(CASES))
def test_explicit_skiprows_vs_pandas(spark, tmp_path, case):
    text, width = CASES[case]
    if case == "bom":
        text = "﻿" + SKIP_META + text.lstrip("﻿")
    else:
        text = SKIP_META + text
    p = _write(tmp_path, f"skip_{case}", text)
    names = [f"n{i}" for i in range(width)]
    df = cs.read_explicit(
        spark, p, ",".join(f"{n}:str" for n in names), skip_rows=2
    )
    if case in PANDAS_INDEX_QUIRK:
        assert _norm_spark(df) == sorted(
            [("1", "2", "3"), ("5", "6", "7")], key=repr
        )
        return
    exp = pd.read_csv(p, skiprows=2, header=0, names=names, dtype=str)
    assert _norm_spark(df) == _norm_pd(exp), case
    assert df.columns == names


# --- variant 4: ragged (ground truth: csv.reader, the parser the
# reference's pandas engine='python' read is built on — modern pandas
# refuses wider-than-first ragged rows outright, see read_ragged doc) --------
@pytest.mark.parametrize("case", sorted(CASES))
def test_ragged_vs_csv_reader(spark, tmp_path, case):
    text, _ = CASES[case]
    p = _write(tmp_path, case, text)
    df = cs.read_ragged(spark, p)
    got = {r.row_id: r.readings for r in df.collect()}

    raw_lines = text.lstrip("﻿").replace("\r\n", "\n").rstrip("\n").split("\n")
    nonblank = [l for l in raw_lines if l != ""]
    expected = {}
    for i, line in enumerate(nonblank):
        fields = next(csv.reader([line]))
        expected[i] = {
            f"column_{j + 1}": v for j, v in enumerate(fields) if v != ""
        }
    # rows whose every field is empty parse to an empty map on both sides
    assert got == expected, case


def test_ragged_skiprows_counts_physical_lines(spark, tmp_path):
    """skiprows is PHYSICAL (blank lines count toward it), while the
    surviving blank lines are invisible to numbering — both pandas
    behaviors, pinned in one file."""
    text = "skipme\n\nx,y\n\n1,2\n"
    p = _write(tmp_path, "ragged_skip", text)
    df = cs.read_ragged(spark, p, skip_rows=2)  # drops 'skipme' AND the blank
    got = {r.row_id: r.readings for r in df.collect()}
    assert got == {
        0: {"column_1": "x", "column_2": "y"},
        1: {"column_1": "1", "column_2": "2"},
    }
