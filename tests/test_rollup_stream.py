"""Streaming continuous rollup: stream-of-batches == one-shot rollup
(bit-identical decimal sums), replay no-ops, interrupted-swap recovery,
and the real streaming engine end to end."""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators.rollup import hourly_rollup
from basic_data_pipeline_spark.streaming import rollup_stream, swapstore

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
T0 = dt.datetime(2024, 3, 1)

EVENTS = [
    (i, T0 + dt.timedelta(minutes=17 * i), i % 5, ["click", "view", "buy"][i % 3],
     round(0.01 * (i * 37 % 991), 2))
    for i in range(200)
]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _batches(spark, k=4):
    per = len(EVENTS) // k
    return [_df(spark, EVENTS[i * per:(i + 1) * per if i < k - 1 else None])
            for i in range(k)]


def _rows(df):
    return sorted(
        (r["hour"], r["event_type"], r["n"], r["value_sum"]) for r in df.collect()
    )


def test_stream_of_batches_equals_oneshot(spark, tmp_path):
    loc = str(tmp_path / "roll")
    rollup_stream.run_rollup_batches(spark, _batches(spark), loc)
    got = _rows(spark.read.parquet(loc))
    want = _rows(hourly_rollup(_df(spark, EVENTS)))
    assert got == want  # decimal accumulation → bit-identical


def test_replay_and_empty_batch_are_noops(spark, tmp_path):
    loc = str(tmp_path / "roll")
    fn = rollup_stream.run_rollup_batches(spark, _batches(spark), loc)
    before = _rows(spark.read.parquet(loc))
    for epoch, b in enumerate(_batches(spark)):
        fn(b, epoch)  # full replay — all skipped
    assert _rows(spark.read.parquet(loc)) == before
    fn(_df(spark, []), 9)  # empty batch advances only the watermark
    assert swapstore.read_watermark(loc, "stream", rollup_stream._META) == 9
    assert _rows(spark.read.parquet(loc)) == before


def test_interrupted_swap_recovery(spark, tmp_path):
    loc = str(tmp_path / "roll")
    b1, b2, b3, b4 = _batches(spark)
    fn = rollup_stream.run_rollup_batches(spark, [b1], loc)

    # crash BETWEEN rmtree and rename: live dir moved to the temp name
    os.rename(loc, swapstore.tmp_path(loc))
    fn(b2, 1)  # recover must complete the swap, then apply epoch 1
    got = _rows(spark.read.parquet(loc))
    want = _rows(
        rollup_stream.merge_rollups(hourly_rollup(b1), hourly_rollup(b2))
    )
    assert got == want

    # incomplete write NEXT TO live state: temp discarded, replay applies
    os.makedirs(swapstore.tmp_path(loc))
    with open(os.path.join(swapstore.tmp_path(loc), "junk"), "w") as f:
        f.write("partial")
    fn(b3, 2)
    got = _rows(spark.read.parquet(loc))
    want = _rows(hourly_rollup(_df(spark, EVENTS[:150])))
    assert got == want
    assert not os.path.exists(swapstore.tmp_path(loc))


def test_streaming_engine_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, b in enumerate(_batches(spark)):
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            for e in b.collect():
                f.write(json.dumps({
                    "event_id": e["event_id"],
                    "ts": e["ts"].strftime("%Y-%m-%dT%H:%M:%S"),
                    "user_id": e["user_id"],
                    "event_type": e["event_type"],
                    "value": e["value"],
                }) + "\n")
    loc = str(tmp_path / "roll")
    q = rollup_stream.rollup_files(
        spark, src, loc, str(tmp_path / "ckpt"), SCHEMA
    )
    q.awaitTermination(120)
    got = _rows(spark.read.parquet(loc))
    want = _rows(hourly_rollup(_df(spark, EVENTS)))
    assert got == want
