"""Streaming quality monitor: per-batch verdicts, idempotent epoch log,
circuit breaker, real streaming engine (streaming/quality_stream.py)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import quality as Q
from basic_data_pipeline_spark.streaming import quality_stream

SCHEMA = "id long, v double, name string"

def _checks():
    # built lazily: Column construction needs an active SparkContext
    return [
        Q.not_null("name_ok", "name"),
        Q.in_range("v_range", "v", 0.0, 100.0),
        Q.unique("pk", "id"),
    ]


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


GOOD = [(i, float(i % 50), f"n{i}") for i in range(40)]
BAD = [(100, 250.0, None), (101, 5.0, "x"), (101, 6.0, "y")]  # range+null+dup


def test_verdicts_match_batch_operator(spark, tmp_path):
    log = str(tmp_path / "qlog")
    fn = quality_stream.make_quality_batch_fn(log, _checks())
    fn(_batch(spark, GOOD), 0)
    fn(_batch(spark, BAD), 1)
    got = {
        (r["epoch"], r["check"]): (r["n_rows"], r["n_pass"], r["passed"])
        for r in quality_stream.read_quality_log(spark, log).collect()
    }
    for epoch, rows in ((0, GOOD), (1, BAD)):
        want = {
            r["check"]: (r["n_rows"], r["n_pass"], r["passed"])
            for r in Q.check_constraints(_batch(spark, rows), _checks()).collect()
        }
        for c, v in want.items():
            assert got[(epoch, c)] == v
    assert not got[(1, "name_ok")][2]
    assert not got[(1, "v_range")][2]
    assert not got[(1, "pk")][2]
    assert all(got[(0, c.name)][2] for c in _checks())


def test_replay_is_idempotent(spark, tmp_path):
    log = str(tmp_path / "qlog")
    fn = quality_stream.make_quality_batch_fn(log, _checks())
    fn(_batch(spark, GOOD), 0)
    before = sorted(
        map(tuple, quality_stream.read_quality_log(spark, log).collect())
    )
    fn(_batch(spark, GOOD), 0)  # replay: same partition overwritten
    after = sorted(
        map(tuple, quality_stream.read_quality_log(spark, log).collect())
    )
    assert after == before
    assert quality_stream.read_quality_log(spark, log).count() == len(_checks())


def test_fail_fast_raises_after_persisting(spark, tmp_path):
    log = str(tmp_path / "qlog")
    fn = quality_stream.make_quality_batch_fn(log, _checks(), fail_fast=True)
    fn(_batch(spark, GOOD), 0)
    with pytest.raises(quality_stream.QualityGateError, match="v_range"):
        fn(_batch(spark, BAD), 1)
    # evidence persisted BEFORE the gate fired
    epochs = {
        r["epoch"]
        for r in quality_stream.read_quality_log(spark, log)
        .select("epoch").distinct().collect()
    }
    assert epochs == {0, 1}


def test_empty_batch_writes_nothing(spark, tmp_path):
    log = str(tmp_path / "qlog")
    fn = quality_stream.make_quality_batch_fn(log, _checks())
    fn(_batch(spark, []), 0)
    assert not os.path.exists(os.path.join(log, "epoch=0"))


def test_streaming_engine_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate((GOOD, BAD)):
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            for r in rows:
                f.write(
                    json.dumps({"id": r[0], "v": r[1], "name": r[2]}) + "\n"
                )
    log = str(tmp_path / "qlog")
    q = quality_stream.quality_files(
        spark, src, log, str(tmp_path / "ckpt"), SCHEMA, _checks()
    )
    q.awaitTermination(120)
    tbl = quality_stream.read_quality_log(spark, log)
    # file source may batch the two files together or apart; the union of
    # verdict rows must cover every check and the aggregate counts match
    agg = {
        r["check"]: (r["n"], r["p"])
        for r in tbl.groupBy("check")
        .agg(F.sum("n_rows").alias("n"), F.sum("n_pass").alias("p"))
        .collect()
    }
    all_rows = GOOD + BAD
    assert agg["name_ok"] == (len(all_rows), len(all_rows) - 1)
    assert agg["v_range"] == (len(all_rows), len(all_rows) - 1)
