"""Unit tests for the CSV scan variants (SURVEY.md §2.1), encoding the
reference docs' worked examples (docs/index.rst:52-114)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from fledge_south_csvplayback_spark.schema import parse_use_columns
from fledge_south_csvplayback_spark.sources import csv_source as cs


def fx(fixture_dir, name):
    return os.path.join(fixture_dir, name)


# --- schema parser (csvplayback.py:601-635 semantics) ----------------------
def test_parse_use_columns_rename_cast():
    specs = parse_use_columns("id:int,temperature:float,status:str")
    assert [s.name for s in specs] == ["id", "temperature", "status"]
    assert specs[0].dtype == T.LongType()
    assert specs[1].dtype == T.DoubleType()


def test_parse_use_columns_drop_and_untyped():
    specs = parse_use_columns("id,,value:float")
    assert [s.name for s in specs] == ["id", "", "value"]
    assert specs[0].dtype is None


def test_parse_use_columns_bad_type():
    with pytest.raises(TypeError):
        parse_use_columns("id:integer")


def test_parse_use_columns_malformed():
    with pytest.raises(ValueError):
        parse_use_columns("id:int:extra")


# --- pick_from_file ---------------------------------------------------------
def test_basic_header_read(spark, fixture_dir):
    df = cs.read_pick_from_file(spark, fx(fixture_dir, "vibration.csv"))
    assert df.columns == ["channel1", "channel2", "user_ts"]
    assert df.count() == 2000


def test_header_at_index_with_skip(spark, fixture_dir):
    # metadata_header.csv: 2 metadata lines, then header, then 100 rows.
    # skip 2 + header at (new) index 0
    df = cs.read_pick_from_file(
        spark, fx(fixture_dir, "metadata_header.csv"), header_row=0, skip_rows=2
    )
    assert df.columns == ["ts", "temp", "pressure"]
    assert df.count() == 100
    # same file expressed as header at physical index 2, no skip
    df2 = cs.read_pick_from_file(
        spark, fx(fixture_dir, "metadata_header.csv"), header_row=2
    )
    assert df2.columns == ["ts", "temp", "pressure"]
    assert df2.count() == 100


def test_fast_path_schema_is_driver_inferred(spark, fixture_dir):
    """The no-skip fast path must pin a driver-inferred schema
    (_infer_ddl over a first-split head sample) — never
    inferSchema=True, whose inference is a full second distributed pass
    over the file (a second 100 TB scan at scale). _infer_ddl's type
    lattice is exactly bigint -> double -> string, so the fixture's
    float channels and tz-suffixed timestamp string pin the outcome."""
    df = cs.read_pick_from_file(spark, fx(fixture_dir, "vibration.csv"))
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "double",
        "double",
        "string",
    ]


def test_compressed_reads(spark, fixture_dir):
    for ext in (".gz", ".bz2"):
        df = cs.read_pick_from_file(spark, fx(fixture_dir, "vibration.csv" + ext))
        assert df.count() == 2000


def test_empty_file_raises(spark, fixture_dir):
    with pytest.raises(EOFError):
        cs.read_pick_from_file(spark, fx(fixture_dir, "empty.csv"))


# --- explicit ---------------------------------------------------------------
def test_explicit_rename_subset_cast(spark, fixture_dir):
    # rename value->temperature, cast to double
    df = cs.read_explicit(
        spark, fx(fixture_dir, "typed.csv"), "id:int,temperature:float,status:str"
    )
    assert df.columns == ["id", "temperature", "status"]
    assert dict(df.dtypes)["temperature"] == "double"
    assert df.count() == 50

    # positional drop: keep id and status only
    df2 = cs.read_explicit(spark, fx(fixture_dir, "typed.csv"), "id:int,,status:str")
    assert df2.columns == ["id", "status"]

    # cast double -> int truncation path
    df3 = cs.read_explicit(
        spark, fx(fixture_dir, "typed.csv"), "id:int,temperature:int,status:str"
    )
    assert dict(df3.dtypes)["temperature"] == "bigint"


def test_explicit_strict_cast(spark, tmp_path):
    """Cast-failure semantics (round-11 verdict item 3): permissive
    default NULLs a bad value; strict=True raises like the reference's
    pandas dtype= read (csvplayback.py:641,648). Empty cells stay NULL
    under both modes."""
    p = str(tmp_path / "bad.csv")
    with open(p, "w") as f:
        f.write("id,value,status\n1,2.5,OK\n2,abc,WARN\n3,,OK\n")
    df = cs.read_explicit(spark, p, "id:int,value:float,status:str")
    assert [r.value for r in df.orderBy("id").collect()] == [2.5, None, None]

    strict = cs.read_explicit(
        spark, p, "id:int,value:float,status:str", strict=True
    )
    with pytest.raises(Exception, match="strict cast failed.*value.*abc"):
        strict.collect()

    # empties don't trip strict mode — only present bad values do
    ok = cs.read_explicit(
        spark, p, "id:int,,status:str", strict=True
    )
    assert ok.count() == 3
    p2 = str(tmp_path / "good.csv")
    with open(p2, "w") as f:
        f.write("id,value,status\n1,2.5,OK\n2,,WARN\n")
    df2 = cs.read_explicit(spark, p2, "id:int,value:float,status:str", strict=True)
    assert [r.value for r in df2.orderBy("id").collect()] == [2.5, None]


def test_explicit_width_mismatch(spark, fixture_dir):
    with pytest.raises(ValueError):
        cs.read_explicit(spark, fx(fixture_dir, "typed.csv"), "id:int,value:float")


# --- ragged -----------------------------------------------------------------
def test_ragged_docs_example(spark, fixture_dir):
    # docs/index.rst:52-67: a,b,c / 2,3,,23 / 4
    df = cs.read_ragged(spark, fx(fixture_dir, "ragged.csv"))
    rows = {r.row_id: r.readings for r in df.collect()}
    assert rows[0] == {"column_1": "a", "column_2": "b", "column_3": "c"}
    assert rows[1] == {"column_1": "2", "column_2": "3", "column_4": "23"}
    assert rows[2] == {"column_1": "4"}


def test_ragged_quoted_fields(spark, fixture_dir):
    """Quote semantics vs the reference's pandas python-engine read
    (csvplayback.py:587-597): quoted commas don't split, doubled quotes
    unescape, quoted-empty drops like bare-empty (round-11 verdict's
    quote-blindness finding)."""
    df = cs.read_ragged(spark, fx(fixture_dir, "ragged.csv"))
    rows = {r.row_id: r.readings for r in df.collect()}
    assert rows[3] == {"column_1": "x", "column_2": "b,c", "column_3": "d"}
    assert rows[4] == {"column_1": 'he said "hi"', "column_2": "z"}
    assert rows[5] == {"column_1": 'q"q', "column_3": "last,one"}


def test_ragged_matches_csv_reader(spark, tmp_path):
    """Property-style cross-check: for RFC4180 single-line rows the
    ragged split must agree field-for-field with csv.reader — the
    parser the reference's pandas engine='python' is built on."""
    import csv as _csv

    lines = [
        "plain,row,here",
        '"only",one',
        'trail,"mid,dle",',
        '",",","',
        '"""",x',          # quoted lone quote, then bare x
        'a,"b""c""d",e',
        '" spaced ",y',
        "no_quotes_at_all",
        'empty,"",tail',
        '6,5",7',          # bare mid-field quote (round-12 review find:
                           # a parity-regex split merges fields here)
        'x,y"z,w',         # quote glued mid-token
        'a,"b',            # unterminated quote: csv.reader swallows to EOL
    ]
    p = str(tmp_path / "quoted.csv")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    df = cs.read_ragged(spark, p)
    got = {r.row_id: r.readings for r in df.collect()}
    for i, line in enumerate(lines):
        expected = {
            f"column_{j + 1}": v
            for j, v in enumerate(next(_csv.reader([line])))
            if v != ""
        }
        assert got.get(i, {}) == expected, f"line {i}: {line!r}"


def test_ragged_quote_then_text_divergence_pinned(spark, tmp_path):
    """The ONE documented csv.reader divergence: text after a closing
    quote (malformed outside RFC4180) stays literal — uniVocity has no
    mode reproducing csv.reader's splice (read_ragged docstring)."""
    p = str(tmp_path / "qjunk.csv")
    with open(p, "w") as f:
        f.write('"a"x,y\n"a,b"c,d\n')
    rows = {r.row_id: r.readings for r in cs.read_ragged(spark, p).collect()}
    assert rows[0] == {"column_1": '"a"x', "column_2": "y"}
    assert rows[1] == {"column_1": '"a,b"c', "column_2": "d"}


def test_ragged_width_cap_fails_loudly(spark, tmp_path):
    """A hostile ultra-wide line must not become an ultra-wide PLAN
    (round-12 review: 20k commas cost 65 s of driver analysis; a
    million would hang it). Past max_fields the read raises with the
    knob named; a trusted wide feed can raise it."""
    p = str(tmp_path / "wide.csv")
    with open(p, "w") as f:
        f.write("a,b\n" + "," * 60 + "\n")
    # (cap lowered here so the test doesn't have to build a huge plan
    # to prove the guard; the default is RAGGED_MAX_FIELDS=4096)
    with pytest.raises(ValueError, match="max_fields"):
        cs.read_ragged(spark, p, max_fields=50)
    rows = cs.read_ragged(spark, p, max_fields=100)
    assert rows.count() == 2  # opt-in still works


def test_header_found_past_deep_blank_preamble(spark, tmp_path):
    """The head fetch widens geometrically when blank lines eat the
    window (round-12 review: a fixed 64-line allowance failed
    spuriously on a 100-blank preamble that pandas reads fine)."""
    p = str(tmp_path / "deep.csv")
    with open(p, "w") as f:
        f.write("\n" * 100)
        f.write("a,b\n1,2\n3,4\n")
    for kw in ({}, {"skip_rows": 1}):  # fast (native) and lineio paths
        df = cs.read_pick_from_file(spark, p, **kw)
        assert df.columns == ["a", "b"], kw
        assert df.count() == 2, kw
    df3 = cs.read_explicit(spark, p, "x:int,y:int", skip_rows=1)
    assert df3.columns == ["x", "y"]
    assert df3.count() == 2


def test_all_blank_file_fails_loudly(spark, tmp_path):
    p = str(tmp_path / "blanks.csv")
    with open(p, "w") as f:
        f.write("\n" * 30)
    with pytest.raises(ValueError, match="no non-blank|no header"):
        cs.read_pick_from_file(spark, p)
    with pytest.raises(ValueError, match="no header"):
        cs.read_pick_from_file(spark, p, skip_rows=2)


# --- metadata capture (S5) --------------------------------------------------
def test_metadata_datapoint(spark, fixture_dir):
    meta = cs.read_metadata_datapoint(spark, fx(fixture_dir, "metadata_header.csv"), 2)
    assert meta == "device=XJ900 site=plant7_calibrated=2020-01-01"


# --- discovery (S1) ---------------------------------------------------------
def test_find_csv_alphabetical_first(fixture_dir):
    d = os.path.join(fixture_dir, "multi")
    assert cs.find_csv_file(d, "vib").endswith("a_vib.csv")
    assert cs.find_csv_file(d, "nomatch") is None
    files = cs.find_csv_files(fixture_dir, "vibration")
    assert [os.path.basename(f) for f in files] == [
        "vibration.csv",
        "vibration.csv.bz2",
        "vibration.csv.gz",
    ]


def test_inference_widens_over_head_sample(spark, tmp_path):
    """A column whose first row is an int but widens to float within the
    head sample must infer double (one-line inference silently nulled
    the later rows — the sampled widening window is the defense)."""
    p = str(tmp_path / "mixed.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,x\n2.5,y\n3,z\n")
    df = cs.read_pick_from_file(spark, p)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "double",
        "string",
    ]
    assert {r.a for r in df.collect()} == {1.0, 2.5, 3.0}


def test_inference_widening_deep_in_sample(spark, tmp_path):
    """The 128-line sample must catch a type that widens late: ints
    for 99 rows, a float on row 100. (Beyond the sample the documented
    sample-based contract applies; this pins the window's SIZE.)"""
    p = str(tmp_path / "late.csv")
    with open(p, "w") as f:
        f.write("a\n")
        for i in range(99):
            f.write(f"{i}\n")
        f.write("99.5\n")
    df = cs.read_pick_from_file(spark, p)
    assert df.schema.fields[0].dataType.simpleString() == "double"
    assert df.filter("a = 99.5").count() == 1


def test_fast_path_no_inference_is_all_string(spark, tmp_path):
    """infer_schema=False on the fast path defers entirely to the native
    reader (all-string, no extra head job)."""
    p = str(tmp_path / "plain.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,x\n")
    df = cs.read_pick_from_file(spark, p, infer_schema=False)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string",
        "string",
    ]
    assert df.collect()[0].a == "1"


def test_head_lines_multi_split_first_lines_in_order(spark, tmp_path):
    """head_lines' fast path CollectLimits over the first split only;
    on a genuinely multi-split file it must still return exactly the
    first n physical lines in file order (and the short-first-split
    fallback must cover files with fewer than n lines)."""
    from fledge_south_csvplayback_spark.sources import lineio

    p = str(tmp_path / "wide.txt")
    lines = [f"line{i:06d}," + "x" * 120 for i in range(4000)]
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024))
        n_splits = spark.read.text(p).rdd.getNumPartitions()
        assert n_splits > 4, n_splits  # the test must exercise multi-split
        assert lineio.head_lines(spark, p, 7) == lines[:7]
        # n beyond the file: every line, still in order (fallback path)
        small = str(tmp_path / "small.txt")
        with open(small, "w") as f:
            f.write("a\nb\nc\n")
        assert lineio.head_lines(spark, small, 10) == ["a", "b", "c"]
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_inference_missing_cells_widen_like_pandas(spark, tmp_path):
    """Missing cells in the sample are missing data, not string
    evidence — and a column with numeric evidence plus a gap widens
    exactly as pandas does (float64 → double). An ALL-missing column
    stays string where pandas says float64: the round-13 pinned
    dtype-only divergence (zero type evidence — string never loses a
    later value; see test_hostile_csv's docstring)."""
    p = str(tmp_path / "gaps.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,\n,\n4,\n")
    import pandas as pd

    assert [str(t) for t in pd.read_csv(p).dtypes] == ["float64", "float64"]
    df = cs.read_pick_from_file(spark, p)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "double",
        "string",
    ]
    assert {r.a for r in df.collect()} == {1.0, None, 4.0}


def test_csv_write_round_trips_quoted_values(spark, tmp_path):
    """Files this engine WRITES must parse back through its own readers
    (and pandas, the reference's engine): the writers pin RFC4180
    doubled-quote escaping — Spark's default backslash escaping came
    back corrupted ('he said \\"hi\\"') through every escape='\"'
    reader (round-12 find)."""
    import glob

    import pandas as pd

    from fledge_south_csvplayback_spark.streaming import playback

    rows = [('he said "hi"', "x,y"), ("plain", "z")]
    df = spark.createDataFrame(rows, "a string, b string").coalesce(1)
    out = str(tmp_path / "w")
    playback.write_csv_append(df, out)
    f = sorted(glob.glob(f"{out}/part-*.csv"))[0]
    back = cs.read_pick_from_file(spark, f)
    assert sorted([tuple(r) for r in back.collect()], key=repr) == sorted(
        rows, key=repr
    )
    pdf = pd.read_csv(f)
    assert sorted(map(tuple, pdf.values.tolist()), key=repr) == sorted(
        rows, key=repr
    )


def test_envelope_handles_mangled_dotted_names(spark, tmp_path):
    """A duplicated CSV header mangles to a dotted name (a.1); the
    envelope builder must treat it as a datapoint NAME, not a
    struct-field path (unquoted it raised
    INVALID_EXTRACT_BASE_FIELD_TYPE — round-12 find, same class as the
    sentinel select's quoting)."""
    from fledge_south_csvplayback_spark.operators import readings as env

    p = str(tmp_path / "dup2.csv")
    with open(p, "w") as f:
        f.write("a,a,user_ts\n1,2,2020-01-01\n")
    df = cs.read_pick_from_file(spark, p)
    assert df.columns == ["a", "a.1", "user_ts"]
    out = env.build_envelope(df, "vib", ts_col="user_ts").collect()
    assert out[0].readings == {"a": "1", "a.1": "2"}
    assert out[0].timestamp == "2020-01-01"


def test_envelope_pandas_ts_format_matches_reference(spark):
    """ts_format="pandas" reproduces str(pandas.Timestamp) — the
    reference's payload timestamp format (csvplayback.py:749-755) —
    byte for byte: 6 fractional digits when nonzero ('.000250', where
    the engine cast trims to '.00025'), none when zero, and the
    +HH:MM suffix for tz-aware (%z-parsed) feeds. The engine default
    stays the oracle-checked minimal-digits cast — a documented
    divergence, with this knob as the byte-level escape hatch."""
    import datetime

    import pandas as pd
    from pyspark.sql import functions as F

    from fledge_south_csvplayback_spark.operators import readings

    vals = [
        datetime.datetime(2019, 12, 12, 13, 14, 15, 250),
        datetime.datetime(2019, 12, 12, 13, 14, 15, 0),
        datetime.datetime(2019, 12, 12, 13, 14, 15, 125000),
        datetime.datetime(2019, 12, 12, 13, 14, 15, 123456),
    ]
    df = spark.createDataFrame([(v, 1.5) for v in vals], "timestamp timestamp, x double")
    # naive (no %z) form
    env = readings.build_envelope(df, asset="a", ts_format="pandas")
    got = sorted(r.timestamp for r in env.collect())
    want = sorted(str(pd.Timestamp(v)) for v in vals)
    assert got == want
    # tz-aware (%z-parsed) form: reference values are UTC-aware
    env_tz = readings.build_envelope(
        df, asset="a", ts_format="pandas", ts_tz_aware=True
    )
    got_tz = sorted(r.timestamp for r in env_tz.collect())
    want_tz = sorted(
        str(pd.Timestamp(v).tz_localize("UTC")) for v in vals
    )
    assert got_tz == want_tz
    # engine default: unchanged, minimal-digit cast
    env_e = readings.build_envelope(df, asset="a")
    eng = {r.timestamp for r in env_e.collect()}
    assert "2019-12-12 13:14:15.00025" in eng  # trimmed engine form
