"""Streaming entity resolution: readStream → foreachBatch
(incremental_resolve) against the persisted fuzzy-match index.

The streaming face of operators/incremental_entity.py — the last
operator family to gain one (dedup/SCD2/rollup/ANN/quality all have
foreachBatch twins): records arrive continuously, each micro-batch is
candidate-joined against the bucketed gram index (only the increment
shuffles), verified, assigned canonical entity ids, and folded into the
index; the batch's (id, entity_id) assignments land in an epoch-tagged
output directory.

Delivery semantics are EXACTLY the dedup-stream contract, via the same
ledger machinery (streaming/dedup_stream.py): incremental_resolve's
index appends (grams/strings tables, alias log) are not replay-safe — a
re-run batch would duplicate gram rows (inflating candidate sets) and
could append conflicting alias records. So:

* an epoch ≤ the ledger's last-applied mark is a full replay of
  completed work — skipped outright, including its output write;
* an INTENT marker brackets the index mutation; a stale marker on
  replay means the crash landed mid-append and the only safe
  continuation is an index rebuild — raised loudly as DirtyIndexError
  rather than silently double-appending;
* the assignments output is an epoch-subdir overwrite, idempotent by
  construction.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators.incremental_entity import (
    _meta_rw,
    incremental_resolve,
)
from basic_data_pipeline_spark.operators import incremental_entity as _opmod_r11
from basic_data_pipeline_spark.streaming.dedup_stream import (
    DirtyIndexError,
    make_guarded_batch_fn,
)

__all__ = ["DirtyIndexError", "make_entity_batch_fn", "entity_files",
           "run_entity_batches"]


def make_entity_batch_fn(
    index_path: str,
    out_root: str,
    tag: str = "stream",
    compact_every: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch body: epoch-guarded incremental entity
    resolution with epoch-tagged assignment output under
    ``out_root/epoch=N/`` — the shared guarded skeleton
    (dedup_stream.make_guarded_batch_fn) around incremental_resolve."""
    return make_guarded_batch_fn(
        index_path,
        out_root,
        # the epoch rides into the alias log (_epoch column) so a
        # rebuild can drop alias rows a crashed epoch half-appended
        lambda batch_df, epoch: incremental_resolve(
            batch_df.sparkSession, batch_df, index_path, epoch=epoch
        ),
        tag=tag,
        what="entity index",
        compact_every=compact_every,
        compact_fn=lambda spark: _opmod_r11.compact_index(spark, index_path),
        max_id_of=lambda b: b.agg(
            F.max(_meta_rw(index_path)["id_col"])
        ).first()[0],
    )


def entity_files(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    out_root: str,
    checkpoint: str,
    schema: str = "id long, name string",
    **kw,
):
    """Drive the streaming resolver through the real streaming engine
    off a file source (the in-container stand-in for Kafka);
    availableNow drains what exists and stops."""
    fn = make_entity_batch_fn(index_path, out_root, **kw)
    raw = spark.readStream.schema(schema).json(source_dir)
    return (
        raw.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_entity_batches(
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
    fn = make_entity_batch_fn(index_path, out_root, **kw)
    for i, b in enumerate(batches):
        fn(b, start_epoch + i)
    return fn
