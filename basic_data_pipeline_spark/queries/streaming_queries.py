"""Streaming-semantics operators surfaced as batch-checkable queries
(SURVEY.md §2.9): event-time tumbling/sliding/session windows + the
late-data policy.

The reference has NO event-time processing — every Kafka message is applied
at arrival time (/root/reference/consumer_to_file.py:195-257). These
queries supply that missing surface over the `events` fixture. Each one
calls the SAME window builders the streaming layer uses
(streaming/windows.py) — `F.window`/`F.session_window` are engine-agnostic,
so correctness proven here in batch carries to `readStream` verbatim
(tests/test_streaming.py drives the streaming engine on the same builders).

Scale notes (100 TB): windowed aggregation state is bounded by
(windows × group keys), not input rows — partial aggregation runs map-side
before the single shuffle on (window, key). Session windows shuffle once on
user_id; skewed users are AQE-split. The sliding window explodes each event
into width/slide assignments BEFORE the partial agg (2× here) — the
explode stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from basic_data_pipeline_spark.catalog import load_table
from basic_data_pipeline_spark.registry import query
from basic_data_pipeline_spark.streaming.windows import (
    session_windows,
    sliding_counts,
    tumbling_counts,
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return load_table(spark, sf_dir, "events")


@query(
    "stream_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP))                   AS window_start,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS window_end,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    headline=True,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling event-time windows per event_type (F.window)."""
    return tumbling_counts(_events(spark, sf_dir), "1 hour")


@query(
    "stream_sliding_window",
    oracle="""
    WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts FROM events),
    assigned AS (
      SELECT time_bucket(INTERVAL 30 MINUTES, ts) AS ws FROM ev
      UNION ALL
      SELECT time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES AS ws FROM ev
    )
    SELECT ws AS window_start, ws + INTERVAL 1 HOUR AS window_end, count(*) AS n
    FROM assigned
    GROUP BY ws
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows hopping every 30 minutes — each event lands in 2
    windows (width/slide); the oracle reproduces the assignment with a
    2-way UNION ALL of slide-aligned buckets."""
    return sliding_counts(_events(spark, sf_dir), "1 hour", "30 minutes")


@query(
    "stream_session_window",
    oracle="""
    WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTES
                  THEN 1 ELSE 0 END AS new_sess
      FROM ev),
    sess AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged)
    SELECT user_id,
           min(ts) AS session_start,
           count(*) AS n_events,
           min(ts) AS first_ts,
           max(ts) AS last_ts
    FROM sess
    GROUP BY user_id, sid
    """,
    headline=True,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 30-minute inactivity gap
    (F.session_window); the oracle is the classic gaps-and-islands
    rewrite (lag > gap starts a new island)."""
    return session_windows(_events(spark, sf_dir), "30 minutes")


@query(
    "stream_late_data_policy",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events
    WHERE CAST(ts AS TIMESTAMP) >=
          (SELECT max(CAST(ts AS TIMESTAMP)) FROM events) - INTERVAL 7 DAYS
    GROUP BY event_type
    """,
)
def stream_late_data_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermark accounting rule as a batch query: rows older than
    max(event_time) - delay are the ones a 7-day watermark would drop.
    In streaming this is `withWatermark("ts", "7 days")` state eviction;
    here the same cutoff is computed with a scalar subquery (one global
    partial max — no shuffle of the fact rows)."""
    e = _events(spark, sf_dir)
    cutoff = e.agg(
        (F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("cutoff")
    )
    return (
        e.join(F.broadcast(cutoff))
        .filter(F.col("ts") >= F.col("cutoff"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
