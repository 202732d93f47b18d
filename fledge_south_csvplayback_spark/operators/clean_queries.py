"""Oracle-checkable queries for the cleaning suite (A1/A2, W1-W3, F4, E1/E2).

All run over the committed dirty/fledge_dump fixtures with all-string
reads, so both engines see identical raw cells; numeric repair casts
happen inside the operators under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fledge_south_csvplayback_spark.operators import clean
from fledge_south_csvplayback_spark.operators.csv_queries import _fx
from fledge_south_csvplayback_spark.sources import csv_source as cs

_DIRTY_SCHEMA = "ts string, a string, b string, allblank string"
_DIRTY_DUCK = (
    "read_csv('{path}', header=true, columns={{'ts': 'VARCHAR', 'a': 'VARCHAR', "
    "'b': 'VARCHAR', 'allblank': 'VARCHAR'}})"
).format(path=_fx("dirty.csv"))

_DUMP_DUCK = (
    "read_csv('{path}', header=true, columns={{'reading': 'VARCHAR', "
    "'user_ts': 'VARCHAR'}})"
).format(path=_fx("fledge_dump.csv"))

# blanks -> null + double cast, both engines (F4 + process_csv_data.py:121)
_NUMERIC_CTE = f"""
WITH s AS (
    SELECT ts,
           (CASE WHEN trim(a) = '' THEN NULL ELSE a END)::DOUBLE AS a,
           (CASE WHEN trim(b) = '' THEN NULL ELSE b END)::DOUBLE AS b
    FROM {_DIRTY_DUCK}
)
"""


def _dirty(spark: SparkSession) -> DataFrame:
    return cs.read_pick_from_file(spark, _fx("dirty.csv"), schema=_DIRTY_SCHEMA)


def _dirty_numeric(spark: SparkSession) -> DataFrame:
    df = clean.whitespace_to_null(_dirty(spark), ["a", "b"])
    return df.select(
        "ts", F.col("a").cast("double"), F.col("b").cast("double")
    )


# --- A1: any-null / any-blank report ----------------------------------------
def clean_null_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clean.null_report(_dirty(spark), ["ts", "a", "b", "allblank"])


_REPORT_COL = (
    "SELECT '{c}' AS column, bool_or({c} IS NULL) AS any_null, "
    "bool_or({c} IS NOT NULL AND trim({c}) = '') AS any_blank FROM s"
)
CLEAN_NULL_REPORT_SQL = (
    f"WITH s AS (SELECT * FROM {_DIRTY_DUCK})\n"
    + "\nUNION ALL\n".join(_REPORT_COL.format(c=c) for c in ("ts", "a", "b", "allblank"))
)


# --- W1/W2: rolling fills ----------------------------------------------------
def clean_rolling_mean_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clean.rolling_mean_fill(_dirty_numeric(spark), ["a", "b"], ["ts"])


CLEAN_ROLLING_MEAN_SQL = (
    _NUMERIC_CTE
    + """
SELECT ts,
       COALESCE(a, avg(a) OVER w) AS a,
       COALESCE(b, avg(b) OVER w) AS b
FROM s
WINDOW w AS (ORDER BY ts ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)
"""
)


def clean_rolling_median_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clean.rolling_median_fill(_dirty_numeric(spark), ["a", "b"], ["ts"])


CLEAN_ROLLING_MEDIAN_SQL = (
    _NUMERIC_CTE
    + """
SELECT ts,
       COALESCE(a, median(a) OVER w) AS a,
       COALESCE(b, median(b) OVER w) AS b
FROM s
WINDOW w AS (ORDER BY ts ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)
"""
)


# --- W3: interpolation -------------------------------------------------------
def clean_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clean.interpolate_fill(
        _dirty_numeric(spark), ["a", "b"], ["ts"], method="linear"
    )


def clean_interpolate_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clean.interpolate_fill(
        _dirty_numeric(spark), ["a", "b"], ["ts"], method="nearest"
    )


def _interp_sql(expr_a: str, expr_b: str) -> str:
    return (
        _NUMERIC_CTE
        + f"""
, n AS (SELECT *, row_number() OVER (ORDER BY ts) AS rn FROM s),
x AS (
    SELECT ts, rn, a, b,
        last_value(a IGNORE NULLS) OVER wp AS pa,
        first_value(a IGNORE NULLS) OVER wn AS na,
        last_value(CASE WHEN a IS NOT NULL THEN rn END IGNORE NULLS) OVER wp AS par,
        first_value(CASE WHEN a IS NOT NULL THEN rn END IGNORE NULLS) OVER wn AS nar,
        last_value(b IGNORE NULLS) OVER wp AS pb,
        first_value(b IGNORE NULLS) OVER wn AS nb,
        last_value(CASE WHEN b IS NOT NULL THEN rn END IGNORE NULLS) OVER wp AS pbr,
        first_value(CASE WHEN b IS NOT NULL THEN rn END IGNORE NULLS) OVER wn AS nbr
    FROM n
    WINDOW wp AS (ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wn AS (ORDER BY rn ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT ts,
       CASE WHEN a IS NOT NULL THEN a WHEN pa IS NULL THEN na
            WHEN na IS NULL THEN pa ELSE {expr_a} END AS a,
       CASE WHEN b IS NOT NULL THEN b WHEN pb IS NULL THEN nb
            WHEN nb IS NULL THEN pb ELSE {expr_b} END AS b
FROM x
"""
    )


CLEAN_INTERP_LINEAR_SQL = _interp_sql(
    "pa + (na - pa) * (rn - par) / (nar - par)",
    "pb + (nb - pb) * (rn - pbr) / (nbr - pbr)",
)
CLEAN_INTERP_NEAREST_SQL = _interp_sql(
    "CASE WHEN (rn - par) <= (nar - rn) THEN pa ELSE na END",
    "CASE WHEN (rn - pbr) <= (nbr - rn) THEN pb ELSE nb END",
)


def clean_interpolate_cubic(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = clean.interpolate_cubic(_dirty_numeric(spark), ["a", "b"], ["ts"])
    # round in both engines: spline values come from two independent
    # double pipelines (numpy vs DuckDB recurrence)
    return out.select("ts", F.round("a", 6).alias("a"), F.round("b", 6).alias("b"))


# Natural-cubic-spline oracle: the tridiagonal (Thomas) solve the numpy
# side runs is a sequential recurrence, expressed here as two recursive
# CTEs (forward sweep `fwd`, back substitution `bwd`) over the knots of
# each column in long format — a genuinely independent implementation,
# not a literal-values crib.
CLEAN_INTERP_CUBIC_SQL = (
    "WITH RECURSIVE "
    + _NUMERIC_CTE.strip().removeprefix("WITH")
    + """
, n AS (SELECT *, row_number() OVER (ORDER BY ts) AS rn FROM s),
long AS (
    SELECT 'a' AS col, rn::DOUBLE AS x, a AS y FROM n
    UNION ALL
    SELECT 'b' AS col, rn::DOUBLE AS x, b AS y FROM n
),
knots AS (
    SELECT col, x, y,
           row_number() OVER (PARTITION BY col ORDER BY x) AS ki,
           count(*) OVER (PARTITION BY col) AS nk
    FROM long WHERE y IS NOT NULL
),
eq AS (  -- one tridiagonal row per interior knot
    SELECT col, ki - 1 AS ei,
           x - lag(x) OVER w AS lo,
           2 * ((x - lag(x) OVER w) + (lead(x) OVER w - x)) AS di,
           lead(x) OVER w - x AS up,
           6 * ((lead(y) OVER w - y) / (lead(x) OVER w - x)
                - (y - lag(y) OVER w) / (x - lag(x) OVER w)) AS rhs
    FROM knots
    WINDOW w AS (PARTITION BY col ORDER BY ki)
    QUALIFY ki > 1 AND ki < nk
),
fwd AS (
    SELECT col, ei, up / di AS cp, rhs / di AS dp FROM eq WHERE ei = 1
    UNION ALL
    SELECT e.col, e.ei,
           e.up / (e.di - e.lo * f.cp),
           (e.rhs - e.lo * f.dp) / (e.di - e.lo * f.cp)
    FROM eq e JOIN fwd f ON e.col = f.col AND e.ei = f.ei + 1
),
bwd AS (
    SELECT f.col, f.ei, f.dp AS m
    FROM fwd f JOIN (SELECT col, max(ei) AS me FROM fwd GROUP BY col) mx
      ON f.col = mx.col AND f.ei = mx.me
    UNION ALL
    SELECT f.col, f.ei, f.dp - f.cp * b.m
    FROM fwd f JOIN bwd b ON f.col = b.col AND f.ei = b.ei - 1
),
m AS (  -- second derivative per knot; natural ends pinned to 0
    SELECT k.col, k.ki, k.x, k.y, COALESCE(b.m, 0.0) AS m
    FROM knots k LEFT JOIN bwd b ON k.col = b.col AND k.ki - 1 = b.ei
),
seg AS (
    SELECT col, x AS x0, y AS y0, m AS m0,
           lead(x) OVER ws AS x1, lead(y) OVER ws AS y1, lead(m) OVER ws AS m1
    FROM m
    WINDOW ws AS (PARTITION BY col ORDER BY ki)
),
holes AS (SELECT col, x FROM long WHERE y IS NULL),
edges AS (
    SELECT col, arg_min(y, x) AS yfirst, arg_max(y, x) AS ylast,
           min(x) AS xmin, max(x) AS xmax
    FROM knots GROUP BY col
),
fills AS (
    SELECT h.col, h.x,
           (s.m0 * pow(s.x1 - h.x, 3) + s.m1 * pow(h.x - s.x0, 3))
               / (6 * (s.x1 - s.x0))
           + (s.y0 / (s.x1 - s.x0) - s.m0 * (s.x1 - s.x0) / 6) * (s.x1 - h.x)
           + (s.y1 / (s.x1 - s.x0) - s.m1 * (s.x1 - s.x0) / 6) * (h.x - s.x0)
               AS y
    FROM holes h JOIN seg s ON h.col = s.col AND h.x > s.x0 AND h.x < s.x1
    UNION ALL
    SELECT h.col, h.x, CASE WHEN h.x < e.xmin THEN e.yfirst ELSE e.ylast END
    FROM holes h JOIN edges e
      ON h.col = e.col AND (h.x < e.xmin OR h.x > e.xmax)
)
SELECT n.ts,
       ROUND(COALESCE(n.a, fa.y), 6) AS a,
       ROUND(COALESCE(n.b, fb.y), 6) AS b
FROM n
LEFT JOIN fills fa ON fa.col = 'a' AND fa.x = n.rn
LEFT JOIN fills fb ON fb.col = 'b' AND fb.x = n.rn
"""
)


# --- W3 folded driver entry (round-7 registry rotation) -----------------------
def clean_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three W3 interpolation variants as ONE method-tagged union,
    per the COVERAGE.md rotation rule (they verify the same §2 row —
    W3 — over the same fixture): each constituent stays
    distinguishable via the ``method`` tag and the unmerged callables
    stay public. Rounded to 6 in BOTH engines (the cubic entry's
    existing protocol, extended to all three so the union is
    uniform)."""
    parts = [
        fn(spark, sf_dir).select(
            F.lit(m).alias("method"),
            "ts",
            F.round("a", 6).alias("a"),
            F.round("b", 6).alias("b"),
        )
        for m, fn in (
            ("linear", clean_interpolate_linear),
            ("nearest", clean_interpolate_nearest),
            ("cubic", clean_interpolate_cubic),
        )
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


CLEAN_INTERP_SQL = "\nUNION ALL\n".join(
    f"SELECT '{m}' AS method, ts, ROUND(a, 6) AS a, ROUND(b, 6) AS b\nFROM ({sql})"
    for m, sql in (
        ("linear", CLEAN_INTERP_LINEAR_SQL),
        ("nearest", CLEAN_INTERP_NEAREST_SQL),
        ("cubic", CLEAN_INTERP_CUBIC_SQL),
    )
)


# --- E1: Fledge-dump flattening ----------------------------------------------
def clean_flatten_fledge_dump(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = cs.read_pick_from_file(
        spark, _fx("fledge_dump.csv"), schema="reading string, user_ts string"
    )
    return clean.flatten_fledge_dump(df, ["channel1", "channel2"])


CLEAN_FLATTEN_SQL = f"""
SELECT CAST(json_extract_string(reading, '$.channel1') AS DOUBLE) AS channel1,
       CAST(json_extract_string(reading, '$.channel2') AS DOUBLE) AS channel2,
       user_ts
FROM {_DUMP_DUCK}
"""


# --- E2: full repair composition (blank->null, drop all-null, fill) ----------
def clean_repair_nans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clean.repair_nans(
        _dirty(spark).select("ts", "a", "b", "allblank"),
        ["a", "b", "allblank"],
        ["ts"],
        method="linear",
    )


CLEAN_REPAIR_SQL = CLEAN_INTERP_LINEAR_SQL  # allblank dropped by A2 on the Spark side


# --- W1/W2 folded driver entry (round-9 registry rotation) ---------------------
def clean_rolling_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both rolling-fill variants as ONE method-tagged union, per the
    COVERAGE.md rotation rule (they verify sibling §2 rows W1/W2 over
    the same fixture with the same window shape): each constituent
    stays distinguishable via the ``method`` tag and the unmerged
    callables stay public/registered-style. Rounded to 6 in both
    engines, the clean_interpolate union protocol."""
    parts = [
        fn(spark, sf_dir).select(
            F.lit(m).alias("method"),
            "ts",
            F.round("a", 6).alias("a"),
            F.round("b", 6).alias("b"),
        )
        for m, fn in (
            ("mean", clean_rolling_mean_fill),
            ("median", clean_rolling_median_fill),
        )
    ]
    return parts[0].unionAll(parts[1])


CLEAN_ROLLING_SQL = "\nUNION ALL\n".join(
    f"SELECT '{m}' AS method, ts, ROUND(a, 6) AS a, ROUND(b, 6) AS b\nFROM ({sql})"
    for m, sql in (
        ("mean", CLEAN_ROLLING_MEAN_SQL),
        ("median", CLEAN_ROLLING_MEDIAN_SQL),
    )
)


# --- W1-W3 + E2 folded driver entry (round-12 registry rotation) --------------
def clean_fill_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-12 registry fold (COVERAGE.md rule): the three fill
    entries — rolling (W1/W2), interpolation (W3), and the E2 repair
    composition — all emit ``(ts, a, b)`` over the SAME dirty.csv
    fixture, so they fold into ONE method-tagged union. Every
    constituent stays hash-distinguishable via the ``method`` tag
    (``repair`` differs from ``linear`` by the A2 all-null column drop
    it also exercises), and the unmerged callables stay public +
    pytest-oracle-checked. The two freed slots register
    ``events_purchase_window`` and ``text_bm25_topk``."""
    repair = clean_repair_nans(spark, sf_dir).select(
        F.lit("repair").alias("method"),
        "ts",
        F.round("a", 6).alias("a"),
        F.round("b", 6).alias("b"),
    )
    return (
        clean_rolling_fill(spark, sf_dir)
        .unionAll(clean_interpolate(spark, sf_dir))
        .unionAll(repair)
    )


CLEAN_FILL_SUITE_SQL = (
    CLEAN_ROLLING_SQL
    + "\nUNION ALL\n"
    + CLEAN_INTERP_SQL
    + "\nUNION ALL\n"
    + "SELECT 'repair' AS method, ts, ROUND(a, 6) AS a, ROUND(b, 6) AS b\n"
    + f"FROM ({CLEAN_REPAIR_SQL})"
)
