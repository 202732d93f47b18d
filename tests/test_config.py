"""Config validation + pacing parity (S2/ST1; csvplayback.py:272-318).

The validation rules and pacing math had implementations mirroring the
reference but NO direct tests — this pins each plugin_init rule, the
gather-all-errors-then-raise behavior, the pacing formulas (replica of
the reference's own arithmetic, not hardcoded constants), and the
FLEDGE_DATA path substitution.
"""

from __future__ import annotations

import pytest

from fledge_south_csvplayback_spark.config import (
    ConfigError,
    IngestMode,
    PlaybackConfig,
    TimestampStyle,
)


def test_valid_default_config_passes():
    cfg = PlaybackConfig()
    assert cfg.period_s > 0 and cfg.chunk_size >= 1


@pytest.mark.parametrize(
    "kw,frag",
    [
        ({"sample_rate": 0}, "sampleRate"),
        ({"sample_rate": 1_000_001}, "sampleRate"),
        ({"burst_interval_ms": 0}, "burstInterval"),
        ({"no_of_rows": 0}, "noOfRows"),
        ({"row_index_for_column_names": -1}, "rowIndexForColumnNames"),
        (
            {
                "timestamp_style": TimestampStyle.COPY_CSV_VALUE,
                "ingest_mode": IngestMode.CONTINUOUS,
                "timestamp_col": "",
            },
            "timestamp column and timestamp format",
        ),
        (
            {
                "timestamp_style": TimestampStyle.COPY_CSV_VALUE,
                "ingest_mode": IngestMode.BURST,
                "timestamp_col": "ts",
            },
            "continuous mode",
        ),
    ],
)
def test_each_plugin_init_rule_raises(kw, frag):
    """One ConfigError per violated reference rule
    (csvplayback.py:275-292), message naming the offender."""
    with pytest.raises(ConfigError, match=frag):
        PlaybackConfig(**kw)


def test_errors_accumulate_like_reference():
    """The reference logs EVERY failed check before raising once
    (errors flag pattern); the dataclass gathers all messages into one
    ConfigError the same way."""
    with pytest.raises(ConfigError) as ei:
        PlaybackConfig(sample_rate=0, burst_interval_ms=0, no_of_rows=0)
    msg = str(ei.value)
    assert "sampleRate" in msg and "burstInterval" in msg and "noOfRows" in msg


@pytest.mark.parametrize("rate,interval", [(8000, 1000), (1, 1), (977, 43)])
def test_burst_pacing_replicates_reference_formula(rate, interval):
    cfg = PlaybackConfig(sample_rate=rate, burst_interval_ms=interval)
    period = round(interval / 1000.0, len(str(interval)) + 1)
    assert cfg.period_s == period
    assert cfg.chunk_size == max(int(period * rate), 1)


@pytest.mark.parametrize("rate", [8000, 1, 977])
def test_continuous_pacing_replicates_reference_formula(rate):
    cfg = PlaybackConfig(
        sample_rate=rate, ingest_mode=IngestMode.CONTINUOUS
    )
    assert cfg.chunk_size == rate
    assert cfg.period_s == round(1.0 / rate, len(str(rate)) + 1)


def test_variable_cols_pace_one_row():
    """variableCols reads one row per chunk in both modes
    (csvplayback.py:300-310)."""
    assert PlaybackConfig(variable_cols=True).chunk_size == 1
    assert (
        PlaybackConfig(
            variable_cols=True, ingest_mode=IngestMode.CONTINUOUS
        ).chunk_size
        == 1
    )


def test_resolve_csv_dir_substitutes_fledge_data(monkeypatch):
    monkeypatch.setenv("FLEDGE_DATA", "/data/fledge")
    assert (
        PlaybackConfig(csv_dir_name="FLEDGE_DATA/sub").resolve_csv_dir()
        == "/data/fledge/sub"
    )
    # only the PREFIX substitutes, and only once
    assert (
        PlaybackConfig(csv_dir_name="/abs/FLEDGE_DATA").resolve_csv_dir()
        == "/abs/FLEDGE_DATA"
    )
    monkeypatch.delenv("FLEDGE_DATA")
    monkeypatch.setenv("FLEDGE_ROOT", "/opt/f")
    assert (
        PlaybackConfig(csv_dir_name="FLEDGE_DATA").resolve_csv_dir()
        == "/opt/f/data"
    )
