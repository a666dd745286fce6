"""Streaming DSIR selection (streaming/selection_stream.py): stream ==
batch under a frozen model, threshold/top-k duality, replay idempotence,
real streaming engine."""

from __future__ import annotations

import json
import os
from decimal import Decimal

from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import selection
from basic_data_pipeline_spark.streaming import selection_stream

SCHEMA = "doc_id long, text string"
N_BUCKETS = 64

RAW = [
    (1, "alpha beta gamma alpha beta"),
    (2, "delta epsilon zeta eta theta iota"),
    (3, "alpha alpha alpha beta"),
    (4, "kappa lambda mu nu xi omicron pi"),
    (5, "alpha beta alpha gamma"),
    (6, "rho sigma tau upsilon phi chi psi"),
    (7, "alpha gamma gamma beta alpha"),
    (8, "omega alpha sigma beta gamma"),
]
TARGET = [
    (100, "alpha beta alpha beta gamma"),
    (101, "alpha gamma beta alpha"),
]


def _model(spark):
    raw = spark.createDataFrame(RAW, SCHEMA)
    tgt = spark.createDataFrame(TARGET, SCHEMA)
    rc = selection.hashed_ngram_counts(raw, "doc_id", "text", N_BUCKETS)
    tc = selection.hashed_ngram_counts(tgt, "doc_id", "text", N_BUCKETS)
    return selection.importance_log_ratios(tc, rc, N_BUCKETS)


def _batch_keys(spark, model):
    raw = spark.createDataFrame(RAW, SCHEMA)
    return {
        r["doc_id"]: (Decimal(r["log_w"]), r["sel_key"])
        for r in selection_stream.score_batch(
            raw, model, "doc_id", "text", N_BUCKETS
        ).collect()
    }


def test_stream_matches_batch_across_boundaries(spark, tmp_path):
    """Two micro-batches against the frozen model keep exactly the docs
    the one-shot batch scoring keeps at the same threshold — batch
    boundaries are invisible because scoring is stateless per doc."""
    model = _model(spark)
    keys = _batch_keys(spark, model)
    # threshold at the 4th-largest key: stream must keep exactly top-4
    # (the Gumbel threshold/top-k duality)
    min_key = sorted((k for _, k in keys.values()), reverse=True)[3]
    out = str(tmp_path / "sel")
    fn = selection_stream.make_selection_batch_fn(
        model, out, "doc_id", "text", min_key, n_buckets=N_BUCKETS
    )
    fn(spark.createDataFrame(RAW[:3], SCHEMA), 0)
    fn(spark.createDataFrame(RAW[3:], SCHEMA), 1)
    got = selection_stream.read_selected(spark, out)
    want = {d for d, (_, k) in keys.items() if k >= min_key}
    assert {r["doc_id"] for r in got.collect()} == want
    assert got.count() == 4
    # the persisted weights/keys equal the batch scoring's exactly
    for r in got.collect():
        assert Decimal(r["log_w"]) == keys[r["doc_id"]][0]
        assert r["sel_key"] == keys[r["doc_id"]][1]


def test_hard_floor_mode(spark, tmp_path):
    """gumbel=False applies a deterministic log_w floor (no noise)."""
    model = _model(spark)
    keys = _batch_keys(spark, model)
    out = str(tmp_path / "sel")
    # floor at the 3rd-largest log_w: exactly those 3 docs must survive
    floor = sorted((float(w) for w, _ in keys.values()), reverse=True)[2]
    fn = selection_stream.make_selection_batch_fn(
        model, out, "doc_id", "text", floor, n_buckets=N_BUCKETS,
        gumbel=False,
    )
    fn(spark.createDataFrame(RAW, SCHEMA), 0)
    got = {r["doc_id"] for r in
           selection_stream.read_selected(spark, out).collect()}
    assert got == {d for d, (w, _) in keys.items() if float(w) >= floor}
    assert len(got) == 3


def test_replay_is_idempotent(spark, tmp_path):
    model = _model(spark)
    out = str(tmp_path / "sel")
    fn = selection_stream.make_selection_batch_fn(
        model, out, "doc_id", "text", -100.0, n_buckets=N_BUCKETS
    )
    fn(spark.createDataFrame(RAW[:4], SCHEMA), 0)
    before = sorted(
        (r["doc_id"], Decimal(r["log_w"]))
        for r in selection_stream.read_selected(spark, out).collect()
    )
    fn(spark.createDataFrame(RAW[:4], SCHEMA), 0)  # replayed epoch
    after = sorted(
        (r["doc_id"], Decimal(r["log_w"]))
        for r in selection_stream.read_selected(spark, out).collect()
    )
    assert after == before == sorted((d, w) for d, (w, _) in
                                     _batch_keys(spark, model).items()
                                     if d <= 4)


def test_streaming_engine_end_to_end(spark, tmp_path):
    model = _model(spark)
    keys = _batch_keys(spark, model)
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate((RAW[:3], RAW[3:])):
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            for d, t in rows:
                f.write(json.dumps({"doc_id": d, "text": t}) + "\n")
    out = str(tmp_path / "sel")
    q = selection_stream.select_files(
        spark, src, out, str(tmp_path / "ckpt"), SCHEMA, model,
        "doc_id", "text", min_key=-100.0, n_buckets=N_BUCKETS,
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: Decimal(r["log_w"])
        for r in selection_stream.read_selected(spark, out).collect()
    }
    assert got == {d: w for d, (w, _) in keys.items()}


def test_incremental_raw_counts_refit_matches_batch_fit(spark, tmp_path):
    """The epoch count log summed across batches reproduces the one-shot
    raw distribution exactly, so a refit model equals the batch model
    bucket-for-bucket (counts are additive — no approximation)."""
    raw = spark.createDataFrame(RAW, SCHEMA)
    tgt = spark.createDataFrame(TARGET, SCHEMA)
    cpath = str(tmp_path / "counts")
    fn = selection_stream.make_count_update_batch_fn(
        cpath, "doc_id", "text", N_BUCKETS
    )
    fn(spark.createDataFrame(RAW[:3], SCHEMA), 0)
    fn(spark.createDataFrame(RAW[3:], SCHEMA), 1)
    summed = selection_stream.read_raw_counts(spark, cpath)
    tc = selection.hashed_ngram_counts(tgt, "doc_id", "text", N_BUCKETS)
    refit = selection.importance_log_ratios(tc, summed, N_BUCKETS)
    rc = selection.hashed_ngram_counts(raw, "doc_id", "text", N_BUCKETS)
    batch = selection.importance_log_ratios(tc, rc, N_BUCKETS)
    as_map = lambda df: {
        r["bucket"]: Decimal(r["lam"]) for r in df.collect()
    }
    assert as_map(refit) == as_map(batch)


def test_count_log_replay_is_idempotent(spark, tmp_path):
    cpath = str(tmp_path / "counts")
    fn = selection_stream.make_count_update_batch_fn(
        cpath, "doc_id", "text", N_BUCKETS
    )
    fn(spark.createDataFrame(RAW[:4], SCHEMA), 0)
    before = sorted(
        (r["bucket"], r["cnt"])
        for r in selection_stream.read_raw_counts(spark, cpath).collect()
    )
    fn(spark.createDataFrame(RAW[:4], SCHEMA), 0)  # replayed epoch
    after = sorted(
        (r["bucket"], r["cnt"])
        for r in selection_stream.read_raw_counts(spark, cpath).collect()
    )
    assert after == before


def test_ns_parameter_threads_through_streaming(spark, tmp_path):
    """A model fit on unigrams only must be scored/maintained with
    ns=(1,) in the streaming bodies — the parameter is plumbed, not
    hardcoded to the (1,2) default."""
    raw = spark.createDataFrame(RAW, SCHEMA)
    tgt = spark.createDataFrame(TARGET, SCHEMA)
    rc1 = selection.hashed_ngram_counts(raw, "doc_id", "text", N_BUCKETS, ns=(1,))
    tc1 = selection.hashed_ngram_counts(tgt, "doc_id", "text", N_BUCKETS, ns=(1,))
    model1 = selection.importance_log_ratios(tc1, rc1, N_BUCKETS)
    batch = {
        r["doc_id"]: Decimal(r["log_w"])
        for r in selection.importance_log_weights(rc1, model1, "doc_id").collect()
    }
    streamed = {
        r["doc_id"]: Decimal(r["log_w"])
        for r in selection_stream.score_batch(
            raw, model1, "doc_id", "text", N_BUCKETS, ns=(1,)
        ).collect()
    }
    assert streamed == batch
    # count maintenance with ns=(1,) reproduces the unigram distribution
    cpath = str(tmp_path / "counts")
    fn = selection_stream.make_count_update_batch_fn(
        cpath, "doc_id", "text", N_BUCKETS, ns=(1,)
    )
    fn(raw, 0)
    summed = {
        (r["bucket"], r["cnt"])
        for r in selection_stream.read_raw_counts(spark, cpath).collect()
    }
    want = {
        (r["bucket"], r["cnt"])
        for r in rc1.groupBy("bucket").agg(F.sum("cnt").alias("cnt")).collect()
    }
    assert summed == want
