"""Trained quality classifier (operators/classifier.py): the distributed
GD fit is pinned against a serial numpy reference, is partition-
invariant (decimal-exact gradients), and actually separates organic
fixture text from constructed junk."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import classifier as C

SF_DIR = "/root/testdata/sf0.001"


def _junk(i: int) -> str:
    """Constructed boilerplate/word-salad: punct-heavy, stopword-free."""
    frag = f"@@x{i}## $$%%&&** ((zqj{i})) //kpw\\\\ ||vvv^^ ~~qq{i}!!"
    return " ".join(frag for _ in range(6 + i % 5))


@pytest.fixture(scope="module")
def labeled(spark):
    organic = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
        .withColumn("label", F.lit(1))
    )
    junk = spark.createDataFrame(
        [(10_000 + i, _junk(i), 0) for i in range(120)],
        "doc_id long, text string, label int",
    )
    return organic.unionByName(junk).cache()


def serial_fit(X, y, n_iters=25, lr=0.5, l2=1e-4):
    """The same algorithm in numpy: z-standardize (same epsilon), zero
    init, full-batch GD with L2 on weights only."""
    n, d = X.shape
    mean = X.sum(axis=0) / n
    std = np.sqrt(np.maximum((X * X).sum(axis=0) / n - mean**2, 1e-12))
    Z = (X - mean) / std
    w = np.zeros(d)
    b = 0.0
    for _ in range(n_iters):
        p = 1.0 / (1.0 + np.exp(-(Z @ w + b)))
        err = p - y
        w = w - lr * (Z.T @ err / n + l2 * w)
        b = b - lr * err.sum() / n
    return mean, std, w, b


def test_fit_matches_serial_numpy(spark, labeled):
    rows = labeled.select(
        C.quality_features(F.col("text")).alias("x"), "label"
    ).collect()
    X = np.array([r["x"] for r in rows])
    y = np.array([float(r["label"]) for r in rows])
    mean, std, w, b = serial_fit(X, y, n_iters=25)

    model = C.train_quality_lr(labeled, "label", n_iters=25)
    assert np.allclose(model.mean, mean, rtol=1e-9, atol=1e-12)
    assert np.allclose(model.std, std, rtol=1e-9, atol=1e-12)
    assert np.allclose(model.weights, w, rtol=1e-7, atol=1e-10)
    assert math.isclose(model.bias, b, rel_tol=1e-7, abs_tol=1e-10)


def test_fit_is_partition_invariant(spark, labeled):
    m1 = C.train_quality_lr(labeled.repartition(1), "label", n_iters=8)
    m2 = C.train_quality_lr(labeled.repartition(13), "label", n_iters=8)
    # decimal-exact gradient sums: the fit is IDENTICAL, not just close
    assert m1 == m2


def test_classifier_separates_junk_from_organic(spark, labeled):
    model = C.train_quality_lr(labeled, "label", n_iters=60)
    scored = labeled.select(
        "label", C.quality_lr_score(model, F.col("text")).alias("s")
    )
    agg = {
        r["label"]: r["m"]
        for r in scored.groupBy("label").agg(F.avg("s").alias("m")).collect()
    }
    assert agg[1] > 0.9 and agg[0] < 0.1
    # and it generalizes to unseen junk of the same character
    unseen = spark.createDataFrame(
        [(1, _junk(997)), (2, _junk(998))], "doc_id long, text string"
    )
    scores = [
        r["s"]
        for r in unseen.select(
            C.quality_lr_score(model, F.col("text")).alias("s")
        ).collect()
    ]
    assert all(s < 0.2 for s in scores)


def test_empty_and_bad_params_raise(spark):
    empty = spark.createDataFrame([], "doc_id long, text string, label int")
    with pytest.raises(ValueError):
        C.train_quality_lr(empty, "label")
    one = spark.createDataFrame(
        [(1, "a b c", 1)], "doc_id long, text string, label int"
    )
    with pytest.raises(ValueError):
        C.train_quality_lr(one, "label", n_iters=0)


def test_model_df_round_trip_exact(spark, labeled, tmp_path):
    """model_df → parquet → model_from_df reproduces the fitted model
    bit-for-bit (doubles pass through unchanged), so a trained quality
    model survives the session like centroids or a BPE merge table."""
    model = C.train_quality_lr(labeled, "label", n_iters=3)
    path = str(tmp_path / "qmodel")
    C.model_df(spark, model).write.parquet(path)
    back = C.model_from_df(spark.read.parquet(path))
    assert back == model  # dataclass equality: exact tuples + bias

    with pytest.raises(ValueError, match="exactly 1 row"):
        C.model_from_df(
            C.model_df(spark, model).unionAll(C.model_df(spark, model))
        )


def test_sample_bounded_training_is_deterministic(spark, labeled):
    """sample_fraction bounds the 60-pass GD to a hash-deterministic
    subsample: identical coefficients under any partitioning, a genuine
    subsample (differs from the full fit), and invalid fractions
    refuse."""
    m1 = C.train_quality_lr(labeled, "label", n_iters=5, sample_fraction=0.5)
    m2 = C.train_quality_lr(
        labeled.repartition(7), "label", n_iters=5, sample_fraction=0.5
    )
    assert m1 == m2  # partitioning-invariant, RNG-free
    full = C.train_quality_lr(labeled, "label", n_iters=5)
    assert m1 != full  # it really trained on a subsample
    # a different salt draws a different (still deterministic) subsample
    m3 = C.train_quality_lr(
        labeled, "label", n_iters=5, sample_fraction=0.5, sample_salt="other"
    )
    assert m3 != m1
    with pytest.raises(ValueError, match="sample_fraction"):
        C.train_quality_lr(labeled, "label", sample_fraction=1.5)
    with pytest.raises(ValueError, match="sample_fraction"):
        C.train_quality_lr(labeled, "label", sample_fraction=0.0)
