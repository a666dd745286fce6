"""Streaming-engine tests: the SAME operator bodies proven in batch run
under Structured Streaming — CDC ingest via file-source foreachBatch, and
event-time windows with watermarks via a real streaming query.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from basic_data_pipeline_spark.sources.envelopes import (
    employee_workload,
    envelopes_to_df,
    expected_final_state,
)
from basic_data_pipeline_spark.streaming.ingest import ingest_files, run_batches
from basic_data_pipeline_spark.streaming.windows import tumbling_counts, with_watermark


def test_streaming_cdc_ingest_matches_batch(spark, tmp_path):
    """readStream(file json) → foreachBatch(apply) produces the same
    compacted table as the direct batch path."""
    wl = employee_workload(n_snapshot=10, n_ops=30, seed=21)
    src = tmp_path / "src"
    src.mkdir()
    rows = [e.to_kafka_row() for e in wl]
    with open(src / "batch0.json", "w") as f:
        for topic, value, partition, offset in rows:
            f.write(
                json.dumps(
                    {"topic": topic, "value": value, "partition": partition, "offset": offset}
                )
                + "\n"
            )

    q = ingest_files(
        spark,
        str(src),
        str(tmp_path / "stream_sink"),
        str(tmp_path / "ckpt"),
        mode="compact",
    )
    q.awaitTermination(120)

    got = {
        r["id"]
        for r in spark.read.option("mergeSchema", "true")
        .parquet(str(tmp_path / "stream_sink" / "employees"))
        .collect()
    }
    assert got == set(expected_final_state(wl))

    # batch path over the same events agrees
    sinks = run_batches(
        spark, [envelopes_to_df(spark, wl)], str(tmp_path / "batch_sink"), mode="compact"
    )
    assert got == {r["id"] for r in sinks["employees"].read().collect()}


def test_streaming_tumbling_window_with_watermark(spark, tmp_path):
    """A real streaming query (file source, availableNow) through
    withWatermark + F.window in append mode emits exactly the finalized
    windows — every emitted row must match the batch computation, and
    only the windows the final watermark left open may be missing."""
    src = tmp_path / "ev"
    src.mkdir()
    base = 1_700_000_000
    rows = [
        {"event_id": i, "ts_s": base + i * 600, "event_type": "click" if i % 2 else "view", "value": float(i)}
        for i in range(48)
    ]
    with open(src / "events.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    def load(reader):
        df = reader.schema(
            "event_id long, ts_s long, event_type string, value double"
        ).json(str(src))
        return df.withColumn("ts", F.timestamp_seconds("ts_s")).drop("ts_s")

    batch_windows = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["total_value"])
        for r in tumbling_counts(load(spark.read), "1 hour").collect()
    }

    agg = tumbling_counts(with_watermark(load(spark.readStream), "30 minutes"), "1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("SELECT * FROM tumbling_test").collect()

    assert emitted, "watermark should have finalized at least one window"
    for r in emitted:
        key = (str(r["window_start"]), r["event_type"])
        assert batch_windows[key] == (r["n"], r["total_value"])
    # append mode must not emit the still-open tail windows
    assert len(emitted) < len(batch_windows)


def test_checkpoint_restart_applies_each_event_once(spark, tmp_path):
    """Exactly-once across restart: run the CDC stream over batch 1, stop,
    add batch 2, restart with the SAME checkpoint — batch 1 must not be
    re-applied (the upgrade over the reference's fresh-group-id replay,
    consumer_to_file.py:185-187). Append mode makes re-application visible
    as duplicate rows."""
    wl = employee_workload(n_snapshot=8, n_ops=0, seed=33)
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def write_file(name, envelopes):
        with open(src / name, "w") as f:
            for topic, value, partition, offset in (e.to_kafka_row() for e in envelopes):
                f.write(json.dumps({"topic": topic, "value": value,
                                    "partition": partition, "offset": offset}) + "\n")

    write_file("b0.json", wl[:5])
    q1 = ingest_files(spark, str(src), sink, ckpt, mode="append")
    q1.awaitTermination(120)

    write_file("b1.json", wl[5:])
    q2 = ingest_files(spark, str(src), sink, ckpt, mode="append")
    q2.awaitTermination(120)

    rows = (
        spark.read.option("mergeSchema", "true")
        .parquet(f"{sink}/employees")
        .collect()
    )
    ids = sorted(r["id"] for r in rows)
    assert ids == sorted(e.after["id"] for e in wl), ids  # once each, no dups


def _write_json(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream inner join with watermarks + a time-range bound: the
    streaming result (file sources, availableNow) must equal the batch
    range-join of the same data — and the range bound is what lets the
    engine evict buffered state, so the query is viable on unbounded
    input."""
    from basic_data_pipeline_spark.streaming.joins import interval_join

    base = 1_700_000_000
    clicks = [
        {"click_id": i, "user": i % 3, "ts_s": base + i * 300}
        for i in range(24)
    ]
    buys = [
        {"buy_id": 100 + i, "user": i % 3, "ts_s": base + i * 900 + 60}
        for i in range(8)
    ]
    _write_json(tmp_path / "clicks" / "c.json", clicks)
    _write_json(tmp_path / "buys" / "b.json", buys)

    def load(reader, d, schema):
        df = reader.schema(schema).json(str(tmp_path / d))
        return df.withColumn("ts", F.timestamp_seconds("ts_s")).drop("ts_s")

    c_schema = "click_id long, user long, ts_s long"
    b_schema = "buy_id long, user long, ts_s long"

    batch = interval_join(
        load(spark.read, "clicks", c_schema).withColumnRenamed("ts", "cts"),
        load(spark.read, "buys", b_schema).withColumnRenamed("ts", "bts"),
        key="user", left_ts="cts", right_ts="bts", max_skew="30 minutes",
    )
    expected = {(r["click_id"], r["buy_id"]) for r in batch.collect()}
    assert expected, "fixture should produce join matches"

    stream = interval_join(
        load(spark.readStream, "clicks", c_schema).withColumnRenamed("ts", "cts"),
        load(spark.readStream, "buys", b_schema).withColumnRenamed("ts", "bts"),
        key="user", left_ts="cts", right_ts="bts", max_skew="30 minutes",
    )
    q = (
        stream.writeStream.format("memory").queryName("ssj_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["click_id"], r["buy_id"])
        for r in spark.sql("SELECT * FROM ssj_test").collect()
    }
    assert got == expected


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: replayed event ids within the
    watermark horizon are emitted once; state is bounded by the horizon."""
    from basic_data_pipeline_spark.streaming.joins import dedup_within_watermark

    base = 1_700_000_000
    rows = [
        {"event_id": i % 6, "ts_s": base + (i % 6) * 60, "v": float(i)}
        for i in range(18)  # every id appears 3x with the same ts
    ]
    _write_json(tmp_path / "dups" / "d.json", rows)

    def load(reader):
        df = reader.schema("event_id long, ts_s long, v double").json(
            str(tmp_path / "dups")
        )
        return df.withColumn("ts", F.timestamp_seconds("ts_s")).drop("ts_s")

    out = dedup_within_watermark(load(spark.readStream), ["event_id"], "1 hour")
    q = (
        out.writeStream.format("memory").queryName("dedup_wm_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = [r["event_id"] for r in spark.sql("SELECT * FROM dedup_wm_test").collect()]
    assert sorted(got) == [0, 1, 2, 3, 4, 5]
    # batch fallback path
    assert dedup_within_watermark(load(spark.read), ["event_id"]).count() == 6


def test_stream_static_enrichment(spark, tmp_path):
    """Stream-static join: dimension broadcast per micro-batch, no state."""
    from basic_data_pipeline_spark.streaming.joins import enrich_stream

    base = 1_700_000_000
    _write_json(
        tmp_path / "se" / "e.json",
        [{"event_id": i, "user": i % 3, "ts_s": base + i} for i in range(9)],
    )
    dim = spark.createDataFrame(
        [(0, "bronze"), (1, "silver"), (2, "gold")], "user long, tier string"
    )

    def load(reader):
        return reader.schema("event_id long, user long, ts_s long").json(
            str(tmp_path / "se")
        )

    out = enrich_stream(load(spark.readStream), dim, "user")
    q = (
        out.writeStream.format("memory").queryName("enrich_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM enrich_test").collect()
    assert len(rows) == 9
    assert all(r["tier"] is not None for r in rows)
