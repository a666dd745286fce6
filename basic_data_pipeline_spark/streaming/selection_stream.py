"""Streaming DSIR selection: score incoming documents against a FROZEN
importance model and keep the ones that clear the bar — selection at
ingest time.

The streaming face of operators/selection.py. The batch pipeline fits the
log p/q bucket table once (``importance_log_ratios`` — an
O(n_buckets)-row frame persisted like a centroid table); this module
applies that frozen model to every micro-batch:

* each document's exact-DECIMAL log-weight comes from the SAME
  ``hashed_ngram_counts`` → ``importance_log_weights`` operators the
  batch side runs, with the model broadcast — per-batch cost is linear
  in batch text, state is zero;
* global top-k is not a streaming notion, so the streaming acceptance
  rule is the Gumbel THRESHOLD: keep a document iff
  ``log_w - log(-log(u_id)) >= min_key`` (the same md5-derived Gumbel
  key the batch sampler ranks by). Acceptance probability is
  ``1 - exp(-exp(log_w - min_key))`` — monotone in the importance
  weight, i.i.d. across documents, and RNG-free, so a replay keeps the
  exact same set. Batch top-k and streaming threshold coincide when
  ``min_key`` is the batch run's k-th key — the classic
  threshold/top-k duality of Gumbel sampling. Pass ``gumbel=False`` for
  a hard deterministic ``log_w >= min_key`` floor instead;
* accepted rows land under ``epoch=<id>`` with overwrite — the
  epoch-partition idempotence pattern of quality_stream.py: a replayed
  batch rewrites an identical partition instead of appending
  duplicates, exactly-once with no swap machinery or index state.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators.selection import (
    gumbel_key,
    hashed_ngram_counts,
    importance_log_weights,
)


def score_batch(
    batch_df: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
    salt: str = "dsir",
    ns: Sequence[int] = (1, 2),
) -> DataFrame:
    """(id, n_grams, log_w, sel_key) for one (micro-)batch against a
    frozen log-ratio model — the shared batch/stream scoring body.
    ``n_buckets`` and ``ns`` MUST match the model's fit parameters, or
    the stream scores a different feature space than the model prices."""
    counts = hashed_ngram_counts(batch_df, id_col, text_col, n_buckets, ns)
    w = importance_log_weights(counts, model, id_col)
    return w.withColumn(
        "sel_key", gumbel_key(F.col("log_w"), F.col(id_col), salt)
    )


def make_selection_batch_fn(
    model: DataFrame,
    out_path: str,
    id_col: str,
    text_col: str,
    min_key: float,
    n_buckets: int = 4096,
    salt: str = "dsir",
    gumbel: bool = True,
    ns: Sequence[int] = (1, 2),
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: keep the micro-batch rows whose selection key
    clears ``min_key`` and persist them (full rows + log_w + sel_key)
    under ``epoch=<id>``. ``n_buckets``/``ns`` must match the model's
    fit parameters."""

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        scored = score_batch(
            batch_df, model, id_col, text_col, n_buckets, salt, ns
        )
        key = F.col("sel_key") if gumbel else F.col("log_w").cast("double")
        kept = batch_df.join(
            scored.filter(key >= min_key).select(
                id_col, "n_grams", "log_w", "sel_key"
            ),
            id_col,
        )
        kept.write.mode("overwrite").parquet(
            os.path.join(out_path, f"epoch={epoch_id}")
        )

    return fn


def read_selected(spark: SparkSession, out_path: str) -> DataFrame:
    """All accepted documents across recorded epochs (epoch column
    included)."""
    return spark.read.option("basePath", out_path).parquet(
        os.path.join(out_path, "epoch=*")
    )


def make_count_update_batch_fn(
    counts_path: str,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
    ns: Sequence[int] = (1, 2),
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body that keeps the DSIR raw distribution FRESH as
    the pool grows: bucket counts are purely additive, so each
    micro-batch appends its own (bucket, cnt) totals — at most
    ``n_buckets`` rows per epoch, regardless of batch volume — under an
    idempotent ``epoch=<id>`` overwrite. No intent markers or swap
    machinery: partitions are independent and replay rewrites an
    identical partition (the quality_stream pattern). The model refit
    reads the SUMMED log (``read_raw_counts``) — O(n_buckets × epochs)
    rows, driver-trivial forever."""

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        totals = (
            hashed_ngram_counts(batch_df, id_col, text_col, n_buckets, ns)
            .groupBy("bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        totals.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(counts_path, f"epoch={epoch_id}")
        )

    return fn


def read_raw_counts(spark: SparkSession, counts_path: str) -> DataFrame:
    """(bucket, cnt) — the raw pool's bucket distribution summed over
    every recorded epoch; feed straight into
    ``operators.selection.importance_log_ratios`` to refit the model."""
    return (
        spark.read.option("basePath", counts_path)
        .parquet(os.path.join(counts_path, "epoch=*"))
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def select_files(
    spark: SparkSession,
    source_dir: str,
    out_path: str,
    checkpoint: str,
    schema: str,
    model: DataFrame,
    id_col: str,
    text_col: str,
    min_key: float,
    **kw,
):
    """Drive streaming selection through the real engine off a file
    source (the in-container Kafka stand-in); availableNow drains what
    exists and stops."""
    fn = make_selection_batch_fn(
        model, out_path, id_col, text_col, min_key, **kw
    )
    raw = spark.readStream.schema(schema).json(source_dir)
    return (
        raw.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
