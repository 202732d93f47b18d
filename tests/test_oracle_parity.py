"""Run every registered query against its DuckDB oracle, mimicking the
driver's CORRECTNESS harness (row count + schema + values), at a small
scale factor so the full suite stays fast."""

from __future__ import annotations

import pytest

from fledge_south_csvplayback_spark import registry
from tests.conftest import TEST_SF_DIR
from tests.oracle_harness import compare

_QUERIES = registry.all_queries()
_ORACLES = registry.all_oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, name):
    df = _QUERIES[name](spark, TEST_SF_DIR)
    ok, msg = compare(df, _ORACLES[name], TEST_SF_DIR)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only(spark, name):
    """Queries without an oracle still must run and return a stable schema."""
    df = _QUERIES[name](spark, TEST_SF_DIR)
    assert df.columns, f"{name}: no columns"
    assert df.count() > 0, f"{name}: empty result"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_envelope_constituents_oracle_parity(spark):
    """The two §1.1 envelope queries folded into reading_envelope_suite
    in round 9 keep the driver's own value check here (the
    de-registration convention: the check moves, it never weakens)."""
    from fledge_south_csvplayback_spark.operators import envelope_queries as E

    for fn, sql in (
        (E.reading_envelope, E.READING_ENVELOPE_SQL),
        (E.reading_envelope_metadata, E.READING_ENVELOPE_METADATA_SQL),
    ):
        ok, msg = compare(fn(spark, TEST_SF_DIR), sql, TEST_SF_DIR)
        assert ok, f"{fn.__name__}: {msg}"


def test_ts_current_time_constituents_oracle_parity(spark):
    """T1/T2 folded into ts_current_time_stamping in round 10; the
    de-registration convention keeps the driver's own value check on
    each unmerged callable here."""
    from fledge_south_csvplayback_spark.operators import ts_queries as T

    for fn, sql in (
        (T.ts_current_time_burst, T.TS_BURST_SQL),
        (T.ts_current_time_continuous, T.TS_CONTINUOUS_SQL),
    ):
        ok, msg = compare(fn(spark, TEST_SF_DIR), sql, TEST_SF_DIR)
        assert ok, f"{fn.__name__}: {msg}"


def test_round11_fold_constituents_oracle_parity(spark):
    """Round-11 folds (csv_explicit_suite, ts_copy_move_csv_value, and
    csv_pick_from_file into csv_directory_codecs): the de-registration
    convention keeps the driver's own value check on each unmerged
    callable here."""
    from fledge_south_csvplayback_spark.operators import csv_queries as C
    from fledge_south_csvplayback_spark.operators import ts_queries as T

    for fn, sql in (
        (C.csv_pick_from_file, C.CSV_PICK_FROM_FILE_SQL),
        (C.csv_explicit_schema, C.CSV_EXPLICIT_SQL),
        (C.csv_explicit_subset, C.CSV_EXPLICIT_SUBSET_SQL),
        (T.ts_copy_csv_value, T.TS_COPY_SQL),
        (T.ts_move_csv_value, T.TS_MOVE_SQL),
    ):
        ok, msg = compare(fn(spark, TEST_SF_DIR), sql, TEST_SF_DIR)
        assert ok, f"{fn.__name__}: {msg}"


def test_round15_fold_constituents_oracle_parity(spark):
    """Round-15 folds (events_props_extract + events_hourly_rollup into
    events_activity_suite; ann_cosine_topk + ann_cosine_topk_sq8 into
    ann_cosine_topk_suite): the de-registration convention keeps the
    driver's own value check on each unmerged callable here."""
    from fledge_south_csvplayback_spark.operators import events as E
    from fledge_south_csvplayback_spark.operators import similarity as S

    for fn, sql in (
        (E.events_props_extract, E.EVENTS_PROPS_SQL),
        (E.events_hourly_rollup, E.EVENTS_HOURLY_SQL),
        (S.ann_cosine_topk, S.ANN_COSINE_TOPK_SQL),
        (S.ann_cosine_topk_sq8, S.ANN_COSINE_TOPK_SQL),
    ):
        ok, msg = compare(fn(spark, TEST_SF_DIR), sql, TEST_SF_DIR)
        assert ok, f"{fn.__name__}: {msg}"
