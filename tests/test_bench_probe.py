"""The bench harness's CPU-scaling probe row (round 16) is a
measurement probe, not a product operator — but its output is still
value-checked against DuckDB so a wrong row can never hide in the
bench: same sha2(256) chain, same concat, same aggregate."""

from __future__ import annotations

import duckdb

import bench
from tests.conftest import TEST_SF_DIR


def test_cpu_scaling_probe_matches_duckdb(spark):
    got = bench.cpu_scaling_probe(spark, TEST_SF_DIR).collect()
    assert len(got) == 1
    expr = "concat(l_orderkey::VARCHAR, '|', l_linenumber::VARCHAR)"
    for _ in range(bench.CPU_PROBE_ROUNDS):
        expr = f"sha256({expr})"
    want = duckdb.sql(
        f"SELECT count(*) AS n, min({expr}) AS min_h, max({expr}) AS max_h "
        f"FROM read_parquet('{TEST_SF_DIR}/lineitem.parquet')"
    ).fetchall()[0]
    row = got[0]
    assert (row["n"], row["min_h"], row["max_h"]) == want
