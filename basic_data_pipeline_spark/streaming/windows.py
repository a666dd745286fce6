"""Event-time windowing: tumbling / sliding / session + watermarks.

The reference has NO event-time processing (SURVEY.md §2.9) — every message
is applied at arrival. These operators supply the streaming-analytics
surface over the `events` fixture. Each builder works on a batch OR
streaming DataFrame (F.window/F.session_window are engine-agnostic); the
streaming tests add withWatermark to bound state, which is what makes the
same plan run forever on an unbounded source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Late-data policy: rows older than max(event_time) - delay are
    dropped from stateful aggregations (the piece the reference lacks)."""
    return events.withWatermark("ts", delay)


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Non-overlapping event-time buckets with per-type counts + value sums.

    Partial aggregation happens before the shuffle; state per window is one
    row, so at 100 TB/day the state size is bounded by (windows × types),
    not input rows.
    """
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Overlapping (hopping) windows — each event lands in width/slide
    buckets; Spark explodes the assignment before the partial agg."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user sessions: a session closes after `gap` of inactivity.
    Batch and streaming share F.session_window; state per open session."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "first_ts",
            "last_ts",
        )
    )
