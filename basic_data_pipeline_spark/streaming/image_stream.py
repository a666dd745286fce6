"""Streaming perceptual image dedup: foreachBatch
(incremental_image_dedup) against the persisted band index.

The streaming face of operators/incremental_images.py: images arrive
continuously (a crawl, an upload firehose), each micro-batch is
decoded, hashed, and deduplicated against every image ever ACCEPTED
(increment-only shuffle), its surviving hash rows land in an
epoch-tagged output directory, and its accepted band rows fold into
the index.

Delivery semantics are the dedup-stream ledger contract verbatim
(streaming/dedup_stream.py machinery): the band-table APPEND is not
replay-safe — a replayed append would duplicate band rows (growth, and
double candidates), and a PARTIAL append from a crash mid-write could
make a replay's batch match its own half-written rows and reject every
survivor as its own duplicate. So completed epochs are skipped
outright, an intent marker brackets the append, a stale marker raises
DirtyIndexError, and streaming/rebuild.py:rebuild_image_index replays
the id watermark cut to recover.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators.incremental_images import (
    _meta_rw,
    incremental_image_dedup,
)
from basic_data_pipeline_spark.operators import incremental_images as _opmod_r11
from basic_data_pipeline_spark.streaming.dedup_stream import (
    DirtyIndexError,
    make_guarded_batch_fn,
)

__all__ = [
    "DirtyIndexError",
    "make_image_batch_fn",
    "image_files",
    "run_image_batches",
]


def make_image_batch_fn(
    index_path: str,
    out_root: str,
    tag: str = "stream",
    compact_every: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: epoch-guarded incremental image dedup with
    epoch-tagged surviving-hash output under ``out_root/epoch=N/`` —
    the shared guarded skeleton around incremental_image_dedup. The
    epoch output is the (id, width, height, ihash) survivor frame, not
    the pixel bytes (join back to the source by id downstream)."""
    return make_guarded_batch_fn(
        index_path,
        out_root,
        lambda batch_df, _epoch: incremental_image_dedup(
            batch_df.sparkSession, batch_df, index_path
        ),
        tag=tag,
        what="image band index",
        compact_every=compact_every,
        compact_fn=lambda spark: _opmod_r11.compact_image_index(spark, index_path),
        max_id_of=lambda b: b.agg(
            F.max(_meta_rw(index_path)["id_col"])
        ).first()[0],
    )


def image_files(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    out_root: str,
    checkpoint: str,
    schema: str = "media_id long, data binary",
    **kw,
):
    """Drive the streaming image dedup through the real streaming
    engine off a file source (the in-container stand-in for an object-
    store notification feed); availableNow drains what exists and
    stops."""
    fn = make_image_batch_fn(index_path, out_root, **kw)
    raw = spark.readStream.schema(schema).parquet(source_dir)
    return (
        raw.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_image_batches(
    spark: SparkSession,
    batches: list[DataFrame],
    index_path: str,
    out_root: str,
    start_epoch: int = 0,
    **kw,
) -> Callable[[DataFrame, int], None]:
    """Drive the foreachBatch body over explicit micro-batches (tests
    needing precise batch boundaries / simulated replays). Returns the
    body so callers can replay epochs explicitly."""
    fn = make_image_batch_fn(index_path, out_root, **kw)
    for i, b in enumerate(batches):
        fn(b, start_epoch + i)
    return fn
