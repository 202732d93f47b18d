"""ETL CLI smoke tests (E3)."""

from __future__ import annotations

from fledge_south_csvplayback_spark import etl

import os

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_etl_flattens_dump(spark, tmp_path):
    out = str(tmp_path / "clean")
    res = etl.run_etl(spark, f"{FIX}/fledge_dump.csv", out, choice="ignore")
    assert set(res.columns) == {"channel1", "channel2", "user_ts"}
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 200


def test_etl_fill_repairs_dirty(spark, tmp_path):
    out = str(tmp_path / "fixed")
    res = etl.run_etl(
        spark, f"{FIX}/dirty.csv", out, choice="fill", method="linear", ts_col="ts"
    )
    assert "allblank" not in res.columns  # all-null column dropped
    back = spark.read.option("header", True).csv(out)
    assert back.filter("a IS NULL OR b IS NULL").count() == 0


def test_etl_drop_removes_holed_columns(spark, tmp_path):
    out = str(tmp_path / "dropped")
    res = etl.run_etl(
        spark, f"{FIX}/dirty.csv", out, choice="drop", ts_col="ts"
    )
    assert set(res.columns) == {"ts"}  # a and b both contain holes


def test_parser_defaults():
    args = etl.build_parser().parse_args(["-i", "in.csv", "-o", "out.csv"])
    assert args.choice == "fill" and args.method == "linear"


def test_etl_cubic_fill(spark, tmp_path):
    """-m cubic reaches interpolate_cubic (reference fill branch accepts
    'cubic', process_csv_data.py:33-34,124)."""
    args = etl.build_parser().parse_args(
        ["-i", "in.csv", "-o", "out.csv", "-m", "cubic"]
    )
    assert args.method == "cubic"
    out = str(tmp_path / "cubic")
    res = etl.run_etl(
        spark, f"{FIX}/dirty.csv", out, choice="fill", method="cubic", ts_col="ts"
    )
    assert "allblank" not in res.columns
    back = spark.read.option("header", True).csv(out)
    # spline fills interior holes; edge gaps clamp to the nearest knot
    assert back.count() > 0
    assert back.filter("a IS NULL OR b IS NULL").count() == 0
