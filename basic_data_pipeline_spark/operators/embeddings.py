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


# --- SQ8 scalar quantization ----------------------------------------------
#
# The third point on the compression curve (JL/PCA reduce DIMENSIONS,
# PQ reduces each subvector to a codebook id, SQ8 reduces each
# COORDINATE to an 8-bit code): per-dimension min/max affine
# quantization, the format FAISS calls ScalarQuantizer(QT_8bit) and
# Lucene/HNSW serve as "int8 scalar quantization". 4x smaller than
# float32 at full dimensionality, no codebook training, and unlike PQ
# the reconstruction error is bounded per-coordinate by scale/2 =
# (hi-lo)/510 — the right choice when recall matters more than the
# extra 8x PQ would buy. All arithmetic is the deterministic
# double-precision affine map, so codes and asymmetric-distance scores
# are bit-identical across engines and partitionings (oracle-checked as
# the sq8 branch of sim_topk_methods).


def sq8_fit(vectors: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(d, lo, hi) per dimension — the SQ8 "model" is just the per-dim
    value range. One posexplode + groupBy(d): n*dim rows enter the agg
    but min/max partials combine map-side, so the shuffle carries only
    dim rows per input partition and the output is dim rows total —
    control-plane sized, broadcastable everywhere it is consumed."""
    return (
        vectors.select(
            F.posexplode(as_double_array(F.col(vec_col))).alias("d", "x")
        )
        .groupBy("d")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    )


def _sq8_arrays(model: DataFrame) -> DataFrame:
    """Fold the dim-row model into ONE row of (lo_arr, hi_arr) ordered by
    dimension, for broadcast into encode/search projections. Struct
    array_sort orders by the leading field (d), so the arrays are
    position-aligned with the vectors regardless of model partitioning."""
    return model.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "lo"))),
            lambda s: s["lo"],
        ).alias("lo_arr"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "hi"))),
            lambda s: s["hi"],
        ).alias("hi_arr"),
    )


def _sq8_scale(d: F.Column) -> tuple[F.Column, F.Column]:
    """(lo_d, scale_d) for 0-based dimension index column ``d``."""
    lo = F.element_at(F.col("lo_arr"), d + 1)
    hi = F.element_at(F.col("hi_arr"), d + 1)
    return lo, (hi - lo) / F.lit(255.0)


def sq8_encode(
    vectors: DataFrame,
    model: DataFrame,
    vec_col: str = "embedding",
    code_col: str = "codes",
) -> DataFrame:
    """Input columns + ``codes`` (array<smallint>, values 0..255):
    code_d = clamp(round((x - lo_d) / scale_d)). Rounding is the
    unambiguous floor(q + 0.5) so every engine agrees on ties;
    out-of-range values (vectors encoded against a model fitted on a
    different corpus) clamp to the code range instead of wrapping.
    Constant dimensions (hi == lo) encode as 0.

    One broadcast of the 1-row (lo_arr, hi_arr) frame + a zero-shuffle
    codegen projection — encoding 100 TB of vectors is embarrassingly
    parallel. Spark's narrowest array element is smallint (no unsigned
    byte); at rest a production sink packs the codes into a
    dim-byte BINARY column — the 4x memory claim — while in-flight
    arithmetic stays on the int codes."""
    enc = F.transform(
        as_double_array(F.col(vec_col)),
        lambda x, d: F.when(
            F.element_at(F.col("hi_arr"), d + 1)
            == F.element_at(F.col("lo_arr"), d + 1),
            F.lit(0),
        )
        .otherwise(
            F.least(
                F.greatest(
                    F.floor(
                        (x - _sq8_scale(d)[0]) / _sq8_scale(d)[1] + F.lit(0.5)
                    ),
                    F.lit(0),
                ),
                F.lit(255),
            )
        )
        .cast("smallint"),
    )
    return (
        vectors.crossJoin(F.broadcast(_sq8_arrays(model)))
        .withColumn(code_col, enc)
        .drop("lo_arr", "hi_arr")
    )


def sq8_decode(
    codes: DataFrame, model: DataFrame, code_col: str = "codes",
    out_col: str = "xhat",
) -> DataFrame:
    """Input columns + ``xhat`` (array<double>): lo_d + code * scale_d —
    the reconstruction used for asymmetric distance. Zero-shuffle
    projection, same broadcast shape as encode."""
    dec = F.transform(
        F.col(code_col),
        lambda c, d: _sq8_scale(d)[0] + c.cast("double") * _sq8_scale(d)[1],
    )
    return (
        codes.crossJoin(F.broadcast(_sq8_arrays(model)))
        .withColumn(out_col, dec)
        .drop("lo_arr", "hi_arr")
    )


def sq8_search(
    queries: DataFrame,
    codes: DataFrame,
    model: DataFrame,
    k: int,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    code_id: str = "vec_id",
    code_col: str = "codes",
) -> DataFrame:
    """(query_id, neighbor_id, rank): top-k by ASYMMETRIC cosine — the
    full-precision query against each candidate's SQ8 reconstruction
    (FAISS's ADC convention: never quantize the query; it is free to
    keep exact and halves the quantization noise in the score).

    Scale shape mirrors similarity.topk_neighbors: candidates are
    decoded ONCE in a projection (one fold per candidate row, not per
    pair), their norms pre-folded, the broadcast-sized query set crosses
    the spread candidate side, and a per-query window takes top-k. The
    candidate frame a production deployment scans is the packed code
    table — 4x less I/O than raw float32 — which is the whole point of
    serving from codes; compose with IVF cell pruning
    (similarity.ivf_*) when even the linear scan is too much."""
    q = queries.select(
        F.col(query_id).alias("query_id"),
        as_double_array(F.col(query_vec)).alias("qv"),
    ).withColumn("qn", F.sqrt(dot(F.col("qv"), F.col("qv"))))
    c = sq8_decode(codes, model, code_col=code_col).select(
        F.col(code_id).alias("neighbor_id"), F.col("xhat").alias("cv")
    ).withColumn("cn", F.sqrt(dot(F.col("cv"), F.col("cv"))))
    from pyspark.sql import Window as W

    from basic_data_pipeline_spark.partitioning import spread

    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .crossJoin(spread(c, "neighbor_id"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
