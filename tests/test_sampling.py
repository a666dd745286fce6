"""Sampling/split determinism tests: membership depends only on
(salt, id) — identical across runs and partitionings, disjoint and
exhaustive splits, stable under corpus growth."""

from __future__ import annotations

from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators.sampling import (
    hash_split,
    stratified_sample,
)

SF_DIR = "/root/testdata/sf0.001"


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_stratified_sample_fractions_and_determinism(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sources = [r["source"] for r in docs.select("source").distinct().collect()]
    fractions = {sources[0]: 1.0, sources[1]: 0.5}
    out1 = _ids(stratified_sample(docs, "source", fractions))
    out2 = _ids(stratified_sample(docs.repartition(13), "source", fractions))
    assert out1 == out2, "membership must not depend on partitioning"

    per_src = {
        r["source"]: r["n"]
        for r in stratified_sample(docs, "source", fractions)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per_src[sources[0]] == totals[sources[0]]  # fraction 1.0 keeps all
    got = per_src.get(sources[1], 0) / totals[sources[1]]
    assert 0.3 < got < 0.7, got  # ~0.5 within hash noise at this size
    assert set(per_src) <= set(fractions), "unlisted strata must be dropped"


def test_hash_split_disjoint_exhaustive_stable(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    splits = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    ids = {k: _ids(v) for k, v in splits.items()}
    all_ids = _ids(docs)
    assert ids["train"] | ids["val"] | ids["test"] == all_ids
    assert not (ids["train"] & ids["val"])
    assert not (ids["train"] & ids["test"])
    assert not (ids["val"] & ids["test"])
    assert len(ids["train"]) > len(ids["val"])

    # growth stability: splitting HALF the corpus assigns every doc the
    # same way as splitting all of it
    half = docs.filter(F.col("doc_id") % 2 == 0)
    half_splits = hash_split(half, {"train": 0.8, "val": 0.1, "test": 0.1})
    for k in ids:
        assert _ids(half_splits[k]) == ids[k] & _ids(half)


def test_hash_split_rejects_bad_weights(spark):
    import pytest as _pytest

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with _pytest.raises(ValueError):
        hash_split(docs, {"train": 0.5, "val": 0.1})
