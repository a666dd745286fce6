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
    "stream_fixed_windows",
    oracle="""
    SELECT 'tumbling' AS kind,
           date_trunc('hour', CAST(ts AS TIMESTAMP))                   AS window_start,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS window_end,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 2, 3, 4
    UNION ALL
    SELECT 'sliding', window_start, window_start + INTERVAL 1 HOUR,
           CAST(NULL AS VARCHAR), n, CAST(NULL AS DOUBLE)
    FROM (
      WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts FROM events),
      assigned AS (
        SELECT time_bucket(INTERVAL 30 MINUTES, ts) AS ws FROM ev
        UNION ALL
        SELECT time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES AS ws
        FROM ev
      )
      SELECT ws AS window_start, count(*) AS n
      FROM assigned GROUP BY ws
    )
    """,
    headline=True,
)
def stream_fixed_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed event-time windows, tag-unioned (merges r1's
    stream_tumbling_window / stream_sliding_window — one §2 line):
    1-hour tumbling per event_type (F.window) + 1-hour windows hopping
    every 30 minutes, where each event lands in width/slide = 2 windows
    (the oracle reproduces the assignment with a 2-way UNION ALL of
    slide-aligned buckets). Both builders are the SAME code the streaming
    layer runs under readStream (streaming/windows.py)."""
    ev = _events(spark, sf_dir)
    tumb = tumbling_counts(ev, "1 hour").select(
        F.lit("tumbling").alias("kind"),
        "window_start",
        "window_end",
        "event_type",
        "n",
        "total_value",
    )
    slide = sliding_counts(ev, "1 hour", "30 minutes").select(
        F.lit("sliding").alias("kind"),
        "window_start",
        "window_end",
        F.lit(None).cast("string").alias("event_type"),
        "n",
        F.lit(None).cast("double").alias("total_value"),
    )
    return tumb.unionByName(slide)


@query(
    "stream_session_late",
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
    SELECT 'session' AS kind, CAST(user_id AS VARCHAR) AS k,
           min(ts) AS first_ts, max(ts) AS last_ts, count(*) AS n
    FROM sess
    GROUP BY user_id, sid
    UNION ALL
    SELECT 'late_kept', event_type, CAST(NULL AS TIMESTAMP),
           CAST(NULL AS TIMESTAMP), count(*)
    FROM events
    WHERE CAST(ts AS TIMESTAMP) >=
          (SELECT max(CAST(ts AS TIMESTAMP)) FROM events) - INTERVAL 7 DAYS
    GROUP BY event_type
    """,
    headline=True,
)
def stream_session_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows + the late-data/watermark policy, tag-unioned
    (merges r1's stream_session_window / stream_late_data_policy).

    Session branch: per-user sessions with a 30-minute inactivity gap
    (F.session_window); the oracle is the classic gaps-and-islands
    rewrite (lag > gap starts a new island). Late branch: the watermark
    accounting rule as a batch query — rows older than max(event_time) -
    delay are what `withWatermark("ts", "7 days")` would evict; the
    cutoff is one global partial max broadcast back, no shuffle of the
    fact rows."""
    e = _events(spark, sf_dir)
    sess = session_windows(e, "30 minutes").select(
        F.lit("session").alias("kind"),
        F.col("user_id").cast("string").alias("k"),
        "first_ts",
        "last_ts",
        F.col("n_events").alias("n"),
    )
    cutoff = e.agg((F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("cutoff"))
    late = (
        e.join(F.broadcast(cutoff))
        .filter(F.col("ts") >= F.col("cutoff"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("late_kept").alias("kind"),
            F.col("event_type").alias("k"),
            F.lit(None).cast("timestamp").alias("first_ts"),
            F.lit(None).cast("timestamp").alias("last_ts"),
            "n",
        )
    )
    return sess.unionByName(late)
