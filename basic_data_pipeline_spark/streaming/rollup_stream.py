"""Streaming continuous aggregate: readStream → foreachBatch merging
each micro-batch's hourly partials into a persisted rollup.

The batch rollup (operators/rollup.py) is hypertable-style: facts
aggregate ONCE into an additive hour×key rollup and every coarser query
reads the rollup. This module keeps that rollup CONTINUOUSLY up to date
as events stream in: each micro-batch is aggregated to hourly partials
(cost ∝ batch) and merged with the stored rollup by re-aggregating on
(hour, key) — cost ∝ rollup size, which is ~10⁴-10⁵× smaller than the
facts, so the merge is cheap at any fact scale. Merging is EXACT: both
the per-batch partials and the merge accumulate in DECIMAL(38,6), so any
batch slicing produces bit-identical sums to the one-shot rollup
(asserted in tests/test_rollup_stream.py).

Delivery semantics come from the shared swap store
(streaming/swapstore.py): the epoch watermark rides inside the rollup
directory, replays are skipped, and the two interrupted-swap windows
recover on the next batch — the same guarantees as the streaming SCD2
history, via the same code path.

At 100 TB the rollup itself can grow wide (many keys × hours); the
rewrite-whole-rollup swap then gives way to partitioning the rollup by
date and rewriting only the dates the batch touched — late data is the
only reason an old date is touched at all, so with a bounded lateness
horizon the rewrite set is bounded too.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators.rollup import hourly_rollup
from basic_data_pipeline_spark.streaming import swapstore

_META = "_rollup_meta.json"


def merge_rollups(old: DataFrame | None, partial: DataFrame) -> DataFrame:
    """Additive merge of two hour×type rollups: sums of sums, sums of
    counts, in decimal so batch boundaries can't change the result."""
    both = partial if old is None else old.unionByName(partial)
    return (
        both.groupBy("hour", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum(F.col("value_sum").cast("decimal(38,6)")).alias("_v"),
        )
        .withColumn("value_sum", F.col("_v").cast("double"))
        .drop("_v")
    )


def make_rollup_batch_fn(
    rollup_path: str, tag: str = "stream"
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: epoch-guarded incremental rollup maintenance
    with an atomic swap."""

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        swapstore.recover(rollup_path)
        if epoch_id <= swapstore.read_watermark(rollup_path, tag, _META):
            return  # replay of completed work
        if batch_df.isEmpty():
            swapstore.advance_watermark(rollup_path, epoch_id, tag, _META)
            return
        spark = batch_df.sparkSession
        old = (
            spark.read.parquet(rollup_path)
            if swapstore.has_data(rollup_path)
            else None
        )
        merged = merge_rollups(old, hourly_rollup(batch_df))
        swapstore.swap_in(merged, rollup_path, epoch_id, tag, _META)

    return fn


def rollup_files(
    spark: SparkSession,
    source_dir: str,
    rollup_path: str,
    checkpoint: str,
    schema: str,
    **kw,
):
    """Drive the continuous rollup through the real streaming engine off
    a file source (the in-container stand-in for Kafka); availableNow
    drains what exists and stops."""
    fn = make_rollup_batch_fn(rollup_path, **kw)
    raw = spark.readStream.schema(schema).json(source_dir)
    return (
        raw.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_rollup_batches(
    spark: SparkSession,
    batches: list[DataFrame],
    rollup_path: str,
    start_epoch: int = 0,
    **kw,
) -> Callable[[DataFrame, int], None]:
    """Drive the foreachBatch body over explicit micro-batches (tests
    needing precise batch boundaries / simulated replays)."""
    fn = make_rollup_batch_fn(rollup_path, **kw)
    for i, b in enumerate(batches):
        fn(b, start_epoch + i)
    return fn
