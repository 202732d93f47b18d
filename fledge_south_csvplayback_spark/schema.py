"""Explicit-schema (``useColumns``) parsing.

Mirrors the reference's ``name[:type]`` spec semantics
(reference csvplayback.py:601-635, docs/index.rst:82-114):

- comma-separated entries, applied *positionally* to the file columns;
- an entry simultaneously renames (overrides the file header), selects
  (empty entries drop that position), and casts (the ``:type`` suffix);
- valid types: str, int, float, bool, timestamp (csvplayback.py:626);
  a bad type raises TypeError, a malformed entry raises ValueError —
  same exception classes as the reference.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def qcol(name: str) -> Column:
    """Column reference by EXACT name, backtick-quoted.

    Names derived from CSV headers can contain dots — reachable since
    the pandas duplicate-header mangle (``a.1``, round 12) — and a
    plain ``F.col("a.1")`` parses the dot as a struct-field path
    (INVALID_EXTRACT_BASE_FIELD_TYPE on a flat column). Every operator
    that references user/header-derived names goes through this."""
    return F.col("`" + name.replace("`", "``") + "`")


def qname(name: str) -> str:
    """The backtick-quoted form of ``name`` for SQL-string fragments
    (e.g. ``F.expr(f"percentile({qname(c)}, 0.5)")``)."""
    return "`" + name.replace("`", "``") + "`"

# reference type map csvplayback.py:607-613, re-targeted at Spark types
TYPE_MAP: dict[str, T.DataType] = {
    "str": T.StringType(),
    "int": T.LongType(),
    "float": T.DoubleType(),
    "bool": T.BooleanType(),
    "timestamp": T.TimestampType(),
}


@dataclass
class ColumnSpec:
    """One positional entry of a useColumns spec."""

    name: str  # '' => drop this position
    dtype: T.DataType | None  # None => keep the inferred/source type


def parse_use_columns(spec: str) -> list[ColumnSpec]:
    if spec == "":
        return []
    out: list[ColumnSpec] = []
    for entry in spec.split(","):
        if entry == "":
            out.append(ColumnSpec("", None))
            continue
        parts = entry.split(":")
        if len(parts) == 1:
            out.append(ColumnSpec(parts[0], None))
        elif len(parts) == 2:
            name, tname = parts
            if tname not in TYPE_MAP:
                raise TypeError(
                    f"{tname} must be in [str, int, float, timestamp, bool]"
                )
            out.append(ColumnSpec(name, TYPE_MAP[tname]))
        else:
            raise ValueError(f"{parts} must be of the form <name>:<type>")
    return out
