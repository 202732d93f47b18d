"""Cleaning-suite semantics pinned against the reference's own pandas
calls (process_csv_data.py:109-148) executed on the dirty fixture."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fledge_south_csvplayback_spark.operators import clean
from fledge_south_csvplayback_spark.operators.clean_queries import (
    _dirty,
    _dirty_numeric,
    clean_repair_nans,
)

FIXTURE = "tests/fixtures/dirty.csv"


def _pandas_numeric() -> pd.DataFrame:
    # the reference's own prep: whitespace->NaN then float cast
    # (process_csv_data.py:119-121)
    df = pd.read_csv(FIXTURE, dtype=str)
    for c in ("a", "b"):
        df[c] = df[c].replace(r"^\s*$", np.nan, regex=True).astype("float64")
    return df


def _spark_sorted(df, cols):
    return [[getattr(r, c) for c in cols] for r in df.orderBy("ts").collect()]


@pytest.mark.parametrize("agg", ["mean", "median"])
def test_rolling_fill_matches_pandas(spark, agg):
    pdf = _pandas_numeric()
    for c in ("a", "b"):
        roll = getattr(pdf[c].rolling(2, min_periods=1), agg)()
        pdf[c] = pdf[c].fillna(roll)  # process_csv_data.py:128-134
    fill = clean.rolling_mean_fill if agg == "mean" else clean.rolling_median_fill
    got = _spark_sorted(fill(_dirty_numeric(spark), ["a", "b"], ["ts"]), ["a", "b"])
    want = pdf[["a", "b"]].values.tolist()
    for g, w in zip(got, want):
        for gv, wv in zip(g, w):
            assert (gv is None and np.isnan(wv)) or gv == pytest.approx(wv)


@pytest.mark.parametrize("method", ["linear", "nearest"])
def test_interpolate_matches_pandas(spark, method):
    if method == "nearest":
        pytest.importorskip("scipy")  # pandas delegates 'nearest' to scipy
    pdf = _pandas_numeric()
    for c in ("a", "b"):
        pdf[c] = pdf[c].interpolate(
            method=method, limit_direction="both"
        )  # process_csv_data.py:124-126
    got = _spark_sorted(
        clean.interpolate_fill(_dirty_numeric(spark), ["a", "b"], ["ts"], method=method),
        ["a", "b"],
    )
    want = pdf[["a", "b"]].values.tolist()
    for g, w in zip(got, want):
        for gv, wv in zip(g, w):
            assert gv == pytest.approx(wv), (method, got, want)


def test_interpolate_nearest_hand_computed(spark):
    # dirty.csv columns after blank->null+cast:
    # a = [1.0, None, 3.0, 4.0, None, 7.0]; b = [None, 2.0, None, 4.5, 6.0, None]
    got = _spark_sorted(
        clean.interpolate_fill(
            _dirty_numeric(spark), ["a", "b"], ["ts"], method="nearest"
        ),
        ["a", "b"],
    )
    # ties (equidistant neighbors) take the earlier value
    assert [g[0] for g in got] == [1.0, 1.0, 3.0, 4.0, 4.0, 7.0]
    assert [g[1] for g in got] == [2.0, 2.0, 2.0, 4.5, 6.0, 6.0]


def test_all_null_column_dropped(spark):
    out = clean_repair_nans(spark, "")
    assert "allblank" not in out.columns
    # linear repair leaves no holes on this fixture
    assert out.filter("a IS NULL OR b IS NULL").count() == 0


def test_null_report_flags(spark):
    rows = {
        r.column: (r.any_null, r.any_blank)
        for r in clean.null_report(
            _dirty(spark), ["ts", "a", "b", "allblank"]
        ).collect()
    }
    assert rows["ts"] == (False, False)
    assert rows["a"] == (True, False)  # empty cells parse as null, not blank
    assert rows["b"] == (True, True)  # has both a null and a whitespace cell
    assert rows["allblank"] == (True, False)
