"""Property tests for the useColumns parser (schema.py) — semantics
mirrored from reference csvplayback.py:601-635."""

from __future__ import annotations

import pytest
from hypothesis import given, strategies as st

from fledge_south_csvplayback_spark.schema import TYPE_MAP, parse_use_columns

_names = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="_"),
    min_size=1,
    max_size=12,
)


@given(st.lists(st.tuples(_names, st.sampled_from(sorted(TYPE_MAP))), min_size=1, max_size=8))
def test_parse_roundtrip_typed(entries):
    spec = ",".join(f"{n}:{t}" for n, t in entries)
    out = parse_use_columns(spec)
    assert [(c.name, c.dtype) for c in out] == [
        (n, TYPE_MAP[t]) for n, t in entries
    ]


@given(st.lists(st.one_of(_names, st.just("")), min_size=1, max_size=8))
def test_parse_untyped_and_drops(names):
    spec = ",".join(names)
    if spec == "":
        assert parse_use_columns(spec) == []
        return
    out = parse_use_columns(spec)
    assert [c.name for c in out] == names
    assert all(c.dtype is None for c in out)


def test_bad_type_raises_typeerror():
    with pytest.raises(TypeError):
        parse_use_columns("a:decimal")


def test_malformed_entry_raises_valueerror():
    with pytest.raises(ValueError):
        parse_use_columns("a:int:extra")
