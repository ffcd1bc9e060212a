"""Event-time window aggregations. Every function here accepts BOTH a
batch and a streaming DataFrame — ``F.window``/``F.session_window``
are engine-level constructs, so the same plan runs under a micro-batch
trigger with watermark state or as a batch replay (which is how the
DuckDB oracle checks them; see plans/streaming_queries.py).

Output timestamps are emitted as epoch seconds (BIGINT) — stable
across engines and parquet timestamp physical types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def with_watermark(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Attach an event-time watermark (no-op on batch DataFrames,
    where Spark ignores watermarks by design)."""
    return events.withWatermark("ts", delay)


def tumbling_window_counts(
    events: DataFrame, width: str = "1 hour", by: str = "event_type"
) -> DataFrame:
    """Non-overlapping event-time windows: count + exact (decimal)
    value sum + event-id checksum (r12 pin — an event bucketed into
    the neighboring window keeps global counts balanced but moves the
    id sum) per (window, key). All three aggregates are plain sums, so
    the same plan runs unchanged under Structured Streaming; state per
    window closes once the watermark passes window.end."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), F.col(by))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
            F.sum("event_id").cast("bigint").alias("event_id_sum"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            F.col(by),
            "n",
            "sum_value",
            "event_id_sum",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    by: str = "event_type",
) -> DataFrame:
    """Overlapping windows (width/slide): each event lands in
    width/slide windows — Spark expands them engine-side. Emits the
    per-window event count plus the event-id checksum (r12 pin): an
    event expanded into the wrong window slot keeps the global count
    balanced but moves the id sum. Deepened r15 with a bit_xor id
    checksum — a different invariant CLASS (per-bit parity): a row
    swap engineered to balance count AND sum still flips xor unless
    the swapped ids are bitwise identical. All three aggregates are
    plain commutative folds, so the same plan runs unchanged under
    Structured Streaming (countDistinct would not)."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), F.col(by))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").cast("bigint").alias("event_id_sum"),
            F.bit_xor("event_id").cast("bigint").alias("event_id_xor"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            F.col(by),
            "n",
            "event_id_sum",
            "event_id_xor",
        )
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "5 minutes",
    by: str = "user_id",
    id_col: str | None = None,
) -> DataFrame:
    """Session windows: per key, events separated by < gap merge into
    one session (Spark's session_window: a session absorbs an event
    arriving strictly before last_ts + gap). Emits per-session event
    count and duration; with ``id_col`` also the per-session id sum —
    a membership checksum pinning WHICH events each session absorbed
    (an event crossing a session boundary keeps both counts only if
    it also balances both id sums)."""
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
    ]
    out_cols = ["n_events", "sum_value"]
    if id_col is not None:
        aggs.append(F.sum(id_col).cast("long").alias(f"{id_col}_sum"))
        out_cols.append(f"{id_col}_sum")
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), F.col(by))
        .agg(*aggs)
        .select(
            F.col(by),
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            (
                F.unix_timestamp(F.col("w.end")) - F.unix_timestamp(F.col("w.start"))
            ).alias("duration_s"),
            *out_cols,
        )
    )
