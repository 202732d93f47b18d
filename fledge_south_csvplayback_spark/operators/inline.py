"""Driver-local rows as JVM-side literal inline tables.

``spark.createDataFrame(list_of_rows)`` plants a ``Scan ExistingRDD``
in the plan and round-trips the rows through a Python worker — measured
4-9 s PER WRITE for a 16-row sidecar at local[32] (the worker spin-up
dominates, not the data). The helpers here keep driver-local tables
fully JVM-side: the whole table rides as ONE JSON string Literal
decoded by ``from_json`` against the declared DDL and exploded with
``inline`` over a 1-row range — a single Py4J round trip however many
rows/values, planning as ``Generate`` over ``Range`` (no ExistingRDD,
so the global plan-hygiene sweep stays clean).

JSON round-trips the supported cell types exactly: ints are int64,
floats are finite doubles whose shortest ``repr`` re-parses to the
identical IEEE double in Jackson (NaN/Inf are NOT representable —
callers must not pass them), strings are UTF-8, None is NULL, and
nested lists map to array columns. Dtypes come from the DDL via the
``from_json`` schema, so both the empty and non-empty branches honor
the declared types regardless of the data's magnitude.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def literal_cols_df(
    spark: SparkSession, cols: dict[str, list], ddl: str
) -> DataFrame:
    """Column-oriented literal inline table: ``cols`` maps each DDL
    field name to its per-row value list (all the same length)."""
    st = T.StructType.fromDDL(ddl)
    names = [f.name for f in st.fields]
    n = len(next(iter(cols.values()))) if cols else 0
    if n:
        rows = [{nm: cols[nm][i] for nm in names} for i in range(n)]
        return spark.range(1).select(
            F.inline(F.from_json(F.lit(json.dumps(rows)), T.ArrayType(st)))
        )
    return spark.range(0).select(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in st.fields]
    )


def literal_rows_df(spark: SparkSession, rows: list, ddl: str) -> DataFrame:
    """Row-oriented convenience wrapper: ``rows`` is a list of tuples
    in DDL field order (the ``createDataFrame(list, ddl)`` shape)."""
    st = T.StructType.fromDDL(ddl)
    names = [f.name for f in st.fields]
    return literal_cols_df(
        spark,
        {nm: [r[i] for r in rows] for i, nm in enumerate(names)},
        ddl,
    )
