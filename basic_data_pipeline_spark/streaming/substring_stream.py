"""Streaming exact substring dedup: readStream → foreachBatch
(incremental_substring_dedup) against the persisted gram index.

The streaming face of operators/incremental_substring.py: documents
arrive continuously, each micro-batch has its repeated ≥k-token spans
cut against every gram the corpus has ever seen (increment-only
shuffle), its surviving rewritten docs land in an epoch-tagged output
directory, and its new grams fold into the index.

Delivery semantics are the dedup-stream ledger contract verbatim
(streaming/dedup_stream.py machinery): the gram-index APPEND is not
replay-safe — a replayed append would duplicate first-occurrence rows
(harmless for the semi-join but unbounded growth) and, worse, a
PARTIAL append from a crash mid-write could make a replay see its own
half-written grams as "already known" and over-remove. So completed
epochs are skipped outright, an intent marker brackets the append, and
a stale marker raises DirtyIndexError (rebuild the index) rather than
risking either failure mode.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators.incremental_substring import (
    _meta_rw,
    incremental_substring_dedup,
)
from basic_data_pipeline_spark.operators import incremental_substring as _opmod_r11
from basic_data_pipeline_spark.streaming.dedup_stream import (
    DirtyIndexError,
    make_guarded_batch_fn,
)

__all__ = ["DirtyIndexError", "make_substring_batch_fn", "substring_files",
           "run_substring_batches"]


def make_substring_batch_fn(
    index_path: str,
    out_root: str,
    tag: str = "stream",
    compact_every: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: epoch-guarded incremental substring dedup with
    epoch-tagged rewritten-document output under ``out_root/epoch=N/`` —
    the shared guarded skeleton (dedup_stream.make_guarded_batch_fn)
    around incremental_substring_dedup."""
    return make_guarded_batch_fn(
        index_path,
        out_root,
        lambda batch_df, _epoch: incremental_substring_dedup(
            batch_df.sparkSession, batch_df, index_path
        ),
        tag=tag,
        what="gram index",
        compact_every=compact_every,
        compact_fn=lambda spark: _opmod_r11.compact_index(spark, index_path),
        max_id_of=lambda b: b.agg(
            F.max(_meta_rw(index_path)["id_col"])
        ).first()[0],
    )


def substring_files(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    out_root: str,
    checkpoint: str,
    schema: str = "doc_id long, text string",
    **kw,
):
    """Drive the streaming substring dedup through the real streaming
    engine off a file source (the in-container stand-in for Kafka);
    availableNow drains what exists and stops."""
    fn = make_substring_batch_fn(index_path, out_root, **kw)
    raw = spark.readStream.schema(schema).json(source_dir)
    return (
        raw.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_substring_batches(
    spark: SparkSession,
    batches: list[DataFrame],
    index_path: str,
    out_root: str,
    start_epoch: int = 0,
    **kw,
) -> Callable[[DataFrame, int], None]:
    """Drive the foreachBatch body over explicit micro-batches (tests
    needing precise batch boundaries / simulated replays)."""
    fn = make_substring_batch_fn(index_path, out_root, **kw)
    for i, b in enumerate(batches):
        fn(b, start_epoch + i)
    return fn
