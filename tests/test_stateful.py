"""applyInPandasWithState operators driven through the real streaming
engine (file source, multiple micro-batches) — state must survive batch
boundaries and event-time timeouts must fire off the watermark.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from basic_data_pipeline_spark.streaming.stateful import (
    running_user_stats,
    sessionize_with_state,
)

BASE = 1_700_000_000


def _write_batch(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _stream(spark, src):
    return (
        spark.readStream.schema("user_id long, ts_s long, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("ts", F.timestamp_seconds("ts_s"))
        .drop("ts_s")
    )


def test_running_stats_accumulate_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(src / "b0.json", [
        {"user_id": 1, "ts_s": BASE, "value": 10.0},
        {"user_id": 1, "ts_s": BASE + 60, "value": 5.0},
        {"user_id": 2, "ts_s": BASE, "value": 1.0},
    ])
    _write_batch(src / "b1.json", [
        {"user_id": 1, "ts_s": BASE + 120, "value": 2.5},
        {"user_id": 3, "ts_s": BASE, "value": 7.0},
    ])

    out = running_user_stats(_stream(spark, src))
    q = (
        out.writeStream.format("memory")
        .queryName("running_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM running_stats ORDER BY n_events"
    ).collect()
    # last emission per user = cumulative totals across batches
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["n_events"], r["total_value"])
    assert final[1] == (3, 17.5)
    assert final[2] == (1, 1.0)
    assert final[3] == (1, 7.0)


def test_sessionize_emits_on_gap_and_timeout(spark, tmp_path):
    """Two sessions for user 1: the first closes mid-stream when a later
    event exceeds the gap; the second closes via event-time TIMEOUT when
    a later batch's watermark passes it."""
    src = tmp_path / "sess"
    src.mkdir()
    gap_s = 30 * 60
    _write_batch(src / "b0.json", [
        {"user_id": 1, "ts_s": BASE, "value": 1.0},
        {"user_id": 1, "ts_s": BASE + 300, "value": 1.0},
        # > gap later: closes session 1 in-stream
        {"user_id": 1, "ts_s": BASE + 300 + gap_s + 600, "value": 1.0},
    ])
    # far-future event pushes the watermark beyond session 2's timeout
    _write_batch(src / "b1.json", [
        {"user_id": 99, "ts_s": BASE + 10 * gap_s, "value": 1.0},
    ])

    events = _stream(spark, src).withWatermark("ts", "10 minutes")
    out = sessionize_with_state(events, gap_ms=gap_s * 1000)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM sessions WHERE user_id = 1 ORDER BY session_start"
    ).collect()
    assert len(rows) == 2
    s1, s2 = rows
    assert s1["n_events"] == 2
    assert (s1["session_end"] - s1["session_start"]).total_seconds() == 300
    assert s2["n_events"] == 1
    assert s2["session_start"] == s2["session_end"]


def test_sessionize_late_event_extends_start_backwards(spark, tmp_path):
    """An out-of-order event inside the watermark that falls within gap
    BEFORE the open session's start must extend the session backwards
    (not silently merge with an unchanged start)."""
    src = tmp_path / "late"
    src.mkdir()
    gap_s = 30 * 60
    _write_batch(src / "b0.json", [
        {"user_id": 1, "ts_s": BASE + 1000, "value": 1.0},
        {"user_id": 1, "ts_s": BASE + 1300, "value": 1.0},
    ])
    # late event 900s BEFORE the session start, still within the huge watermark
    _write_batch(src / "b1.json", [
        {"user_id": 1, "ts_s": BASE + 100, "value": 1.0},
    ])
    # far-future event closes user 1's session via timeout
    _write_batch(src / "b2.json", [
        {"user_id": 99, "ts_s": BASE + 100 * gap_s, "value": 1.0},
    ])
    events = _stream(spark, src).withWatermark("ts", "48 hours")
    out = sessionize_with_state(events, gap_ms=gap_s * 1000)
    q = (
        out.writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM late_sessions WHERE user_id = 1").collect()
    assert len(rows) == 1
    s = rows[0]
    assert s["n_events"] == 3
    assert int(s["session_start"].timestamp()) == BASE + 100  # extended back
    assert int(s["session_end"].timestamp()) == BASE + 1300
