"""Streaming inverted-index maintenance: readStream → foreachBatch
(incremental_retrieval_append) against the persisted BM25 index.

The streaming face of operators/incremental_retrieval.py: documents
arrive continuously, each micro-batch's postings / df deltas / stats
row fold into the index at increment cost, and the batch's indexing
receipt (one row per document: neighbor_id, dl, n_terms) lands in an
epoch-tagged output directory. A search
(incremental_retrieval.search_retrieval_index) at any quiescent point
returns exactly what the one-shot bm25_topk would return over every
document indexed so far.

Delivery semantics are the dedup-stream ledger contract verbatim
(streaming/dedup_stream.py machinery): the postings/dfreq/stats appends
are not replay-safe — a replayed append would double every df count and
corpus statistic (silently WRONG scores, not just growth), and a crash
mid-append leaves a partial epoch across up to three tables. So
completed epochs are skipped outright, an intent marker brackets the
append, and a stale marker raises DirtyIndexError; the matching
streaming/rebuild.py helper (rebuild_retrieval_index) cuts every
partial row with one watermark filter per table.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators.incremental_retrieval import (
    _meta_rw,
    incremental_retrieval_append,
)
from basic_data_pipeline_spark.operators import incremental_retrieval as _opmod_r11
from basic_data_pipeline_spark.streaming.dedup_stream import (
    DirtyIndexError,
    make_guarded_batch_fn,
)

__all__ = ["DirtyIndexError", "make_retrieval_batch_fn", "retrieval_files",
           "run_retrieval_batches"]


def make_retrieval_batch_fn(
    index_path: str,
    out_root: str,
    tag: str = "stream",
    compact_every: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: epoch-guarded incremental index append with
    the per-document indexing receipt under ``out_root/epoch=N/`` — the
    shared guarded skeleton (dedup_stream.make_guarded_batch_fn) around
    incremental_retrieval_append."""
    return make_guarded_batch_fn(
        index_path,
        out_root,
        lambda batch_df, _epoch: incremental_retrieval_append(
            batch_df.sparkSession, batch_df, index_path
        ),
        tag=tag,
        what="retrieval index",
        compact_every=compact_every,
        compact_fn=lambda spark: _opmod_r11.compact_index(spark, index_path),
        max_id_of=lambda b: b.agg(
            F.max(_meta_rw(index_path)["id_col"])
        ).first()[0],
    )


def retrieval_files(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    out_root: str,
    checkpoint: str,
    schema: str = "doc_id long, text string",
    **kw,
):
    """Drive the streaming index maintenance through the real streaming
    engine off a file source (the in-container stand-in for Kafka);
    availableNow drains what exists and stops."""
    fn = make_retrieval_batch_fn(index_path, out_root, **kw)
    raw = spark.readStream.schema(schema).json(source_dir)
    return (
        raw.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_retrieval_batches(
    spark: SparkSession,
    batches: list[DataFrame],
    index_path: str,
    out_root: str,
    start_epoch: int = 0,
    **kw,
) -> Callable[[DataFrame, int], None]:
    """Drive the foreachBatch body over explicit micro-batches (tests
    needing precise batch boundaries / simulated replays)."""
    fn = make_retrieval_batch_fn(index_path, out_root, **kw)
    for i, b in enumerate(batches):
        fn(b, start_epoch + i)
    return fn
