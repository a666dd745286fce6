"""Streaming audio dedup: foreachBatch (incremental_audio_dedup)
against the persisted constellation index.

The streaming face of operators/incremental_audio.py, and the audio
twin of streaming/image_stream.py: clips arrive continuously, each
micro-batch is decoded, fingerprinted, and offset-vote-matched against
every recording ever accepted (increment-only shuffle), its surviving
fingerprint rows land in an epoch-tagged output directory, and its
accepted constellation folds into the index.

Delivery semantics are the dedup-stream ledger contract verbatim
(streaming/dedup_stream.py machinery): the fingerprint APPEND is not
replay-safe — a replayed append would duplicate constellation rows
(growth AND inflated votes on later matches), and a PARTIAL append
from a crash mid-write could make a replay's batch out-vote itself
against its own half-written rows. Completed epochs are skipped, an
intent marker brackets the append, a stale marker raises
DirtyIndexError, and streaming/rebuild.py:rebuild_audio_index recovers
via the id-watermark cut.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators.incremental_audio import (
    _meta_rw,
    incremental_audio_dedup,
)
from basic_data_pipeline_spark.operators import incremental_audio as _opmod_r11
from basic_data_pipeline_spark.streaming.dedup_stream import (
    DirtyIndexError,
    make_guarded_batch_fn,
)

__all__ = [
    "DirtyIndexError",
    "make_audio_batch_fn",
    "audio_files",
    "run_audio_batches",
]


def make_audio_batch_fn(
    index_path: str,
    out_root: str,
    tag: str = "stream",
    compact_every: int | None = None,
    **match_kw,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: epoch-guarded incremental audio dedup with
    epoch-tagged surviving-fingerprint output under
    ``out_root/epoch=N/``. ``match_kw`` (min_votes, max_hash_df) passes
    through to incremental_audio_dedup."""
    return make_guarded_batch_fn(
        index_path,
        out_root,
        lambda batch_df, _epoch: incremental_audio_dedup(
            batch_df.sparkSession, batch_df, index_path, **match_kw
        ),
        tag=tag,
        what="audio fingerprint index",
        compact_every=compact_every,
        compact_fn=lambda spark: _opmod_r11.compact_audio_index(spark, index_path),
        max_id_of=lambda b: b.agg(
            F.max(_meta_rw(index_path)["id_col"])
        ).first()[0],
    )


def audio_files(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    out_root: str,
    checkpoint: str,
    schema: str = "media_id long, data binary",
    **kw,
):
    """Drive the streaming audio dedup through the real streaming
    engine off a file source; availableNow drains what exists and
    stops."""
    fn = make_audio_batch_fn(index_path, out_root, **kw)
    raw = spark.readStream.schema(schema).parquet(source_dir)
    return (
        raw.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_audio_batches(
    spark: SparkSession,
    batches: list[DataFrame],
    index_path: str,
    out_root: str,
    start_epoch: int = 0,
    **kw,
) -> Callable[[DataFrame, int], None]:
    """Drive the foreachBatch body over explicit micro-batches (tests
    needing precise batch boundaries / simulated replays)."""
    fn = make_audio_batch_fn(index_path, out_root, **kw)
    for i, b in enumerate(batches):
        fn(b, start_epoch + i)
    return fn
