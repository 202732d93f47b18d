"""Local replica of the driver's DuckDB-oracle compare.

For each registered query: run the Spark DataFrame and the oracle SQL
on the same parquet tables, sort columns by name, sort rows, and
compare cell-by-cell (floats with tolerance, everything else exactly).
This is deliberately *stricter* than needed in dtype handling so that
hash-style mismatches surface locally before the driver sees them.
"""

from __future__ import annotations

import math
import os
from datetime import datetime, timezone
from decimal import Decimal

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for t in TABLES:
            # fixture dirs may carry only the table under test, and a
            # Spark-written table is a DIRECTORY of part files
            p = f"{sf_dir}/{t}.parquet"
            if not os.path.exists(p):
                continue
            if os.path.isdir(p):
                p = f"{p}/*.parquet"
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def spark_run(df):
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return v
    if isinstance(v, datetime):
        # Spark (session tz UTC) returns naive or aware depending on type;
        # duckdb TIMESTAMP is naive UTC. Normalize to naive UTC.
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _sort_key(row):
    return tuple(
        (v is None, str(type(v).__name__), str(v)) for v in row
    )


def compare(spark_df, oracle_sql: str, sf_dir: str, float_rel_tol: float = 1e-9):
    """Return (ok, message). Mimics driver: count + schema-names + values."""
    s_cols, s_rows = spark_run(spark_df)
    d_cols, d_rows = duckdb_run(oracle_sql, sf_dir)

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"

    # reorder both to sorted-column order, normalize, sort rows
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    d_idx = [d_cols.index(c) for c in sorted(d_cols)]
    s_norm = sorted(
        (tuple(_norm(r[i]) for i in s_idx) for r in s_rows), key=_sort_key
    )
    d_norm = sorted(
        (tuple(_norm(r[i]) for i in d_idx) for r in d_rows), key=_sort_key
    )

    for rn, (sr, dr) in enumerate(zip(s_norm, d_norm)):
        for cn, (sv, dv) in enumerate(zip(sr, dr)):
            if isinstance(sv, float) and isinstance(dv, float):
                if math.isnan(sv) and math.isnan(dv):
                    continue
                if not math.isclose(sv, dv, rel_tol=float_rel_tol, abs_tol=1e-9):
                    return False, (
                        f"value mismatch row {rn} col {sorted(s_cols)[cn]}: "
                        f"spark={sv!r} duckdb={dv!r}"
                    )
            elif sv != dv:
                return False, (
                    f"value mismatch row {rn} col {sorted(s_cols)[cn]}: "
                    f"spark={sv!r} duckdb={dv!r}"
                )
    return True, f"ok ({len(s_rows)} rows)"
