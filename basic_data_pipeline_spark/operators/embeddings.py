"""Embedding dimensionality reduction: random projection and PCA.

The embedding-compaction stage of an LLM data pipeline — before ANN
indexing or semantic dedup, high-dimensional embeddings are reduced so
the index fits memory and the distance folds get cheaper. Two standard
reducers, each Spark-first at a different point of the design space:

* ``random_projection`` — Johnson-Lindenstrauss ±1/√d' projection with a
  HASH-SEEDED deterministic matrix (md5 byte parity, the same
  construction as similarity.lsh_bucket's hyperplanes): no fitted state,
  no driver artifact, any executor regenerates the matrix from (salt,
  component, dim) alone. Pure JVM expression folds — embarrassingly
  parallel, zero shuffles, reproducible across any partitioning. The
  right tool when d' ≳ ln(n)/ε² is acceptable and no training pass is
  affordable.

* ``pca_fit`` / ``pca_project`` — exact principal components via the
  two-moment sweep: ONE Arrow pass computes per-batch (count, sum, Gram
  matrix) partials with numpy (d×d each, constant size), one tiny
  aggregation folds them element-wise, and the d×d eigendecomposition
  runs on the driver (d ≤ a few thousand — control-plane math, like
  k-means centroids or BPE merge selection). The corpus is touched
  exactly once however large it is; only d²-sized state ever moves.
  Components are sign-canonicalized (largest-|component| coordinate
  positive) so refits are reproducible.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators.similarity import (
    as_double_array,
    dot,
)


def _jl_component(salt: str, j: int, dim: int) -> list[float]:
    """Deterministic ±1 row j of the projection matrix: coordinate d is
    +1 iff md5("{salt}:{j}:{d}") has an odd first byte — regenerable
    anywhere, no state."""
    import hashlib

    return [
        1.0 if hashlib.md5(f"{salt}:{j}:{d}".encode()).digest()[0] % 2
        else -1.0
        for d in range(dim)
    ]


def random_projection(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    out_dim: int,
    salt: str = "rp",
) -> DataFrame:
    """(id, vec): Johnson-Lindenstrauss reduction to ``out_dim`` via a
    deterministic ±1/√out_dim matrix. One projection fold per output
    coordinate, all inside whole-stage codegen; no shuffle, no fitted
    state. Distances are preserved within (1±ε) for
    out_dim = O(ln n / ε²) — the JL guarantee."""
    if not 0 < out_dim <= dim:
        raise ValueError("need 0 < out_dim <= dim")
    scale = 1.0 / float(np.sqrt(out_dim))
    v = as_double_array(F.col(vec_col))
    comps = [
        F.array(*[F.lit(x) for x in _jl_component(salt, j, dim)])
        for j in range(out_dim)
    ]
    out = F.array(*[(dot(v, comp) * F.lit(scale)) for comp in comps])
    return vectors.select(F.col(id_col), out.alias(vec_col))


def pca_fit(
    vectors: DataFrame,
    vec_col: str,
    dim: int,
    out_dim: int,
) -> dict:
    """Fit PCA on ``vectors``; returns {"mean": [d], "components":
    [out_dim][d], "explained_variance": [out_dim], "n": int} — a
    driver-side model dict (d²-sized control-plane state).

    One Arrow pass over the data (per-batch numpy moment partials), one
    constant-size aggregation, one driver eigh. See module docstring."""
    import pandas as pd

    if not 0 < out_dim <= dim:
        raise ValueError("need 0 < out_dim <= dim")

    part_schema = "n long, s array<double>, g array<double>"

    def moments(batches):
        n, s, g = 0, np.zeros(dim), np.zeros((dim, dim))
        for pdf in batches:
            x = np.stack(pdf[vec_col].map(np.asarray).values).astype(
                np.float64
            )
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    parts = vectors.select(vec_col).mapInPandas(moments, part_schema)
    # Element-wise fold of the constant-size partials: zip_with sums in
    # one aggregation — rows here = #partitions, never data-sized.
    zeros = F.array_repeat(F.lit(0.0), dim)
    zeros_g = F.array_repeat(F.lit(0.0), dim * dim)
    agg = parts.agg(
        F.sum("n").alias("n"),
        F.aggregate(
            F.collect_list("s"), zeros,
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        ).alias("s"),
        F.aggregate(
            F.collect_list("g"), zeros_g,
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        ).alias("g"),
    ).first()
    n = int(agg["n"])
    if n < 2:
        raise ValueError("need at least 2 vectors to fit PCA")
    mean = np.asarray(agg["s"]) / n
    gram = np.asarray(agg["g"]).reshape(dim, dim)
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:out_dim]
    comps = evecs[:, order].T  # (out_dim, dim)
    # Sign canonicalization: largest-|x| coordinate of each component
    # is made positive, so the fit is unique up to eigh's tolerance.
    for r in comps:
        if r[np.argmax(np.abs(r))] < 0:
            r *= -1.0
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_variance": evals[order].tolist(),
        "n": n,
    }


def pca_project(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    model: dict,
) -> DataFrame:
    """(id, vec): center by the fitted mean and project onto the
    components — pure JVM folds (one per output coordinate), no Python,
    no shuffle."""
    mean = F.array(*[F.lit(float(x)) for x in model["mean"]])
    centered = F.zip_with(
        as_double_array(F.col(vec_col)), mean, lambda a, b: a - b
    )
    out = F.array(
        *[
            dot(centered, F.array(*[F.lit(float(x)) for x in comp]))
            for comp in model["components"]
        ]
    )
    return vectors.select(F.col(id_col), out.alias(vec_col))
