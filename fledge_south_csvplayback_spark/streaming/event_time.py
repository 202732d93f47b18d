"""Event-time streaming operators (SURVEY.md §2.10 ST8 — extension).

The reference *generates* event time but never aggregates on it; a
complete engine needs the watermarked event-time surface:

- ``windowed_counts``: tumbling-window aggregation with a watermark —
  late data beyond the bound is dropped, state is evicted, and the
  result converges to the batch ``events_hourly_rollup`` over the same
  rows (asserted in tests).
- ``session_windows``: gap-based per-user sessions via
  ``session_window`` — open sessions merge across micro-batches in
  the state store, the watermark closes and evicts them.
- ``stream_stream_range_join``: watermarked stream-stream inner join
  with a time-range bound — the range predicate is what makes both
  sides' buffered state evictable.
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

from fledge_south_csvplayback_spark.session import ensure_ltz

RUNNING_TOTALS_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


# watermarks require TIMESTAMP (with local timezone); the shared cast
# helper lives next to the session builder whose pinned-UTC timezone
# makes it value-preserving
_ltz = ensure_ltz


def windowed_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type."""
    return (
        _ltz(stream, "ts").withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).start.alias("hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def stream_dedup_exact(
    stream: DataFrame,
    content_col: str = "payload",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming ingest dedup: drop rows whose content fingerprint was
    already seen within the watermark horizon.

    The batch ``dedup_exact`` keyed by ``md5(content)`` re-expressed
    for continuous ingest: ``dropDuplicatesWithinWatermark`` keeps one
    row per fingerprint and — unlike plain ``dropDuplicates`` — evicts
    fingerprint state once the watermark passes, so state is bounded by
    the duplicate-arrival horizon instead of growing with the full
    corpus. That bound is what makes exact dedup runnable on an
    unbounded 100 TB ingest stream.
    """
    return (
        _ltz(stream, "ts")
        .withColumn("fingerprint", F.md5(F.col(content_col).cast("string")))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def session_windows(
    stream: DataFrame,
    gap: str = "4 hours",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap-based session windows per user via ``session_window`` — the
    built-in streaming equivalent of the batch ``events.sessionize``
    lag-window operator: consecutive events of a user belong to one
    session while each inter-event gap stays under ``gap``; the window
    end is last-event-ts + gap. Unlike fixed windows, open sessions
    MERGE when a late event bridges two of them — the state store
    handles the merge, and the watermark closes (and evicts) sessions
    once event time passes their end, bounding state by the number of
    OPEN sessions rather than all history. Verified behavior note:
    session windows drop watermark-late input rows even in *complete*
    output mode (plain windowed aggs don't) — pick the watermark from
    the real out-of-orderness of the source, not as a formality.
    Per-key state is tiny
    (start/end/aggregates), so the scale risk is key skew — one
    pathological user with a never-closing session — not volume.

    Boundary semantics vs the batch operator: ``sessionize`` starts a
    new session when a gap is strictly greater than the threshold,
    ``session_window`` already splits at exactly the threshold; the
    two agree whenever no gap equals the threshold to the microsecond
    (asserted against real data in tests).

    Works identically over a batch DataFrame (``session_window`` is a
    regular grouping expression; the watermark is a streaming-only
    hint) — the convergence test runs THIS function both ways."""
    return (
        _ltz(stream, "ts")
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def stream_stream_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join with a time-range bound:
    each left event pairs with the right events of the same key that
    occur in ``[left.ts, left.ts + within]`` — the streaming analog of
    the batch ``events.range_join`` (attribution: clicks within an
    hour of the impression, purchases within a day of the click, …).

    Why the range condition is mandatory, not decorative: a
    stream-stream equi-join must buffer BOTH sides in the state store,
    and without a time bound neither side is ever evictable — state
    grows with the whole stream. With watermarks on both inputs plus
    the range predicate, Spark derives each side's eviction horizon
    (left rows age out once the right watermark passes ``l_ts +
    within``; right rows once the left watermark passes ``r_ts``), so
    state is bounded by rate × (watermark + within) regardless of
    total volume. Output columns are prefixed ``l_``/``r_`` — a
    self-join of one logical stream (view→click) would collide
    otherwise.
    """
    l = (  # noqa: E741 — l/r mirror the output column prefixes
        _ltz(left, "ts")
        .withWatermark("ts", watermark)
        .select(
            F.col(key).alias(key),
            F.col("ts").alias("l_ts"),
            F.col("event_type").alias("l_type"),
            F.col("value").alias("l_value"),
        )
    )
    r = (
        _ltz(right, "ts")
        .withWatermark("ts", watermark)
        .select(
            F.col(key).alias(f"r_{key}"),
            F.col("ts").alias("r_ts"),
            F.col("event_type").alias("r_type"),
            F.col("value").alias("r_value"),
        )
    )
    cond = (
        (F.col(key) == F.col(f"r_{key}"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner").drop(f"r_{key}")


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


def enrich_stream(
    stream: DataFrame, dim: DataFrame, on: str = "user_id"
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch left-joins the
    static dimension (user profile, device registry, …).

    The dim is explicitly ``broadcast()``-hinted: Spark re-plans the
    join per micro-batch, and without the hint a large-looking static
    side makes EVERY micro-batch pay a shuffled join — the classic
    streaming-enrichment scale trap. A dim too big to broadcast
    belongs in a state store (``applyInPandasWithState``) or a
    key-value lookup, not a per-batch shuffle. Left join: an event
    with no dim row flows through with nulls rather than being
    dropped mid-stream. No event-time cast here — the join is generic
    over streams with or without a timestamp column; watermarked
    consumers downstream apply their own ``ensure_ltz``."""
    return stream.join(F.broadcast(dim), on, "left")
