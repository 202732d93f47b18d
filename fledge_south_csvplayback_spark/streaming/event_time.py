"""Event-time streaming operators (SURVEY.md §2.10 ST8 — extension).

The reference *generates* event time but never aggregates on it; a
complete engine needs the watermarked event-time surface:

- ``windowed_counts``: tumbling-window aggregation with a watermark —
  late data beyond the bound is dropped, state is evicted, and the
  result converges to the batch ``events_hourly_rollup`` over the same
  rows (asserted in tests).
- ``running_totals_stateful``: a custom stateful operator via
  ``applyInPandasWithState`` — per-key running totals kept in
  GroupState across micro-batches (the shape any bespoke streaming
  accumulator takes when windows/aggs can't express it).

Both operate on a file-source stream of the events table's shape; at
scale the same code runs against Kafka/object-store streams unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def windowed_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).start.alias("hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def running_totals_stateful(stream: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum) via applyInPandasWithState.

    The update function is self-contained (no module globals) so it
    pickles by value for the executor Python workers.
    """

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
