"""Streaming link-graph maintenance: foreachBatch (add_edges) against
the persisted graph index.

The streaming face of operators/incremental_linkgraph.py: a crawl
emits (src, dst) edges continuously; each micro-batch folds into the
bucketed edge table, newly seen nodes gain label rows, component
merges append to the merge log, and the batch's RESOLVED
(node, component) rows land in an epoch-tagged output directory.

Delivery semantics are the dedup-stream ledger contract verbatim
(streaming/dedup_stream.py machinery): the three index mutations are
not replay-safe — a replayed epoch would duplicate edge/label rows and
re-log merges — so completed epochs are skipped outright, an intent
marker brackets the mutation, a stale marker raises DirtyIndexError,
and streaming/rebuild.py:rebuild_graph_index cuts all three tables
back to the completed-epoch watermark (edges on src, labels and merges
on _wm — the monotone-src crawl convention: a batch's edges originate
from that batch's newly fetched pages).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators.incremental_linkgraph import (
    add_edges,
)
from basic_data_pipeline_spark.operators import incremental_linkgraph as _opmod_r11
from basic_data_pipeline_spark.streaming.dedup_stream import (
    DirtyIndexError,
    make_guarded_batch_fn,
)

__all__ = [
    "DirtyIndexError",
    "make_graph_batch_fn",
    "edge_files",
    "run_edge_batches",
]


def make_graph_batch_fn(
    index_path: str,
    out_root: str,
    tag: str = "stream",
    compact_every: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: epoch-guarded incremental graph maintenance
    with epoch-tagged resolved-component output under
    ``out_root/epoch=N/``. The watermark passed to add_edges is the
    batch's max src — the id the ledger records on completion, so the
    rebuild cut and the append tags always agree."""

    def body(batch_df: DataFrame, _epoch: int) -> DataFrame:
        wm = batch_df.agg(F.max("src")).first()[0]
        return add_edges(
            batch_df.sparkSession, batch_df, index_path, wm=wm
        )

    return make_guarded_batch_fn(
        index_path,
        out_root,
        body,
        tag=tag,
        what="link-graph index",
        compact_every=compact_every,
        compact_fn=lambda spark: _opmod_r11.compact_graph_index(spark, index_path),
        max_id_of=lambda b: b.agg(F.max("src")).first()[0],
    )


def edge_files(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    out_root: str,
    checkpoint: str,
    schema: str = "src long, dst long",
    **kw,
):
    """Drive the streaming graph maintenance through the real streaming
    engine off a file source; availableNow drains what exists and
    stops."""
    fn = make_graph_batch_fn(index_path, out_root, **kw)
    raw = spark.readStream.schema(schema).parquet(source_dir)
    return (
        raw.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_edge_batches(
    spark: SparkSession,
    batches: list[DataFrame],
    index_path: str,
    out_root: str,
    start_epoch: int = 0,
    **kw,
) -> Callable[[DataFrame, int], None]:
    """Drive the foreachBatch body over explicit micro-batches (tests
    needing precise batch boundaries / simulated replays)."""
    fn = make_graph_batch_fn(index_path, out_root, **kw)
    for i, b in enumerate(batches):
        fn(b, start_epoch + i)
    return fn
