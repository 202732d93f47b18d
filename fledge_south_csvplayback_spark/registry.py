"""Central query registry backing the driver contract.

Each operator module registers its oracle-checkable queries here; the
repo-root ``__spark_entry__.py`` re-exports them as ``queries()`` /
``oracle_sql()``. A query is a callable ``(spark, sf_dir) -> DataFrame``
plus (usually) a DuckDB-compatible SQL string that must produce the same
rows (same column names — the driver sorts columns by name and hashes
values order-insensitively).

Queries whose semantics aren't SQL-expressible register with
``sql=None`` and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle; None => rows-only check


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, fn: QueryFn, sql: str | None) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query registration: {name}")
    _REGISTRY[name] = RegisteredQuery(name, fn, sql)


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {q.name: q.fn for q in _REGISTRY.values()}


def all_oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {q.name: q.sql for q in _REGISTRY.values() if q.sql is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from fledge_south_csvplayback_spark import queries as _  # noqa: F401

    _LOADED = True
