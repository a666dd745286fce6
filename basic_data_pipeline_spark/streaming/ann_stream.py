"""Streaming ANN index maintenance: readStream → foreachBatch appending
epoch deltas to the persisted IVF index.

The streaming face of the persisted IVF index (operators/similarity.py
ivf_build_index / ivf_index_add): new vectors arrive continuously, get
assigned to the FROZEN centroids (the standard IVF contract — cells
drift only on explicit rebuild), and become searchable immediately.

Delivery semantics WITHOUT a dirty-index failure mode: a plain
``ivf_index_add`` append is not replay-safe (a re-run batch would
double-append its vectors), so the streaming maintainer writes each
micro-batch's assignments to its OWN epoch partition —

    assigned_epochs/epoch=N/cell=K/part-*.parquet

— with overwrite. A replayed epoch rewrites an identical partition
instead of appending duplicates (the epoch-subdir idempotence pattern of
quality_stream/dedup_stream), so foreachBatch's at-least-once becomes
exactly-once per epoch with no ledger, no intent marker, and no
rebuild-the-index failure path. Searches read base ∪ epoch deltas with
the same cell-pruned probe join; ``compact_epochs`` periodically folds
deltas into the base (compaction ledger → folding is itself
crash-idempotent) so the file count stays bounded.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import similarity

_EPOCHS = "assigned_epochs"
_COMPACT_LEDGER = "_compacted.json"


def _epochs_root(index_path: str) -> str:
    return os.path.join(index_path, _EPOCHS)


def _folded_epochs(index_path: str) -> set[int]:
    try:
        with open(os.path.join(index_path, _COMPACT_LEDGER)) as f:
            return set(json.load(f)["folded"])
    except FileNotFoundError:
        return set()


def make_ann_batch_fn(
    index_path: str,
    dim: int,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: assign the batch to the stored centroids (one
    broadcast pass, no training) and overwrite its epoch partition."""

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if epoch_id in _folded_epochs(index_path):
            return  # replay of an epoch already folded into the base
        spark = batch_df.sparkSession
        cents = spark.read.parquet(os.path.join(index_path, "centroids"))
        (
            similarity.ivf_assign(batch_df, cents, dim)
            .select("vec_id", "embedding", "cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(os.path.join(_epochs_root(index_path), f"epoch={epoch_id}"))
        )

    return fn


def live_assigned(spark: SparkSession, index_path: str) -> DataFrame:
    """base inverted lists ∪ un-compacted epoch deltas, one frame."""
    base = spark.read.parquet(os.path.join(index_path, "assigned")).select(
        "vec_id", "embedding", "cell"
    )
    root = _epochs_root(index_path)
    if not os.path.isdir(root) or not os.listdir(root):
        return base
    deltas = (
        spark.read.option("basePath", root)
        .parquet(os.path.join(root, "epoch=*"))
        .select("vec_id", "embedding", "cell")
    )
    return base.unionByName(deltas)


def ann_search_live(
    queries: DataFrame,
    index_path: str,
    dim: int,
    k: int,
    nprobe: int = 2,
) -> DataFrame:
    """Top-k against the LIVE index (base + streamed deltas) — the same
    cell-pruned probe join as the batch search, same results the moment
    an epoch lands."""
    return similarity.ivf_index_search(
        queries, index_path, dim, k, nprobe,
        assigned=live_assigned(queries.sparkSession, index_path),
        # a crashed-then-retried compaction can transiently hold a vector
        # in both base and delta; dedup on the probed candidate set keeps
        # ranks correct through that window
        dedup_candidates=True,
    )


def compact_epochs(spark: SparkSession, index_path: str) -> int:
    """Fold every un-folded epoch delta into the base inverted lists;
    returns the number of epochs folded.

    Crash-IDEMPOTENT by construction, not by ordering: the new base is
    REBUILT as dropDuplicates(vec_id) over base ∪ deltas and swapped in
    atomically (temp + rename — vec_ids are unique, so folding the same
    delta twice collapses to one row). Whatever step a crash interrupts,
    rerunning compaction converges: a half-written temp is overwritten,
    an already-swapped base simply re-deduplicates, and the ledger +
    delta-dir cleanup happen strictly after the swap. The rebuild costs
    one pass over the index — that is what compaction IS; the streaming
    hot path never pays it (appends stay per-epoch overwrites)."""
    root = _epochs_root(index_path)
    if not os.path.isdir(root):
        return 0
    folded = _folded_epochs(index_path)
    on_disk = {
        int(d.split("=", 1)[1])
        for d in os.listdir(root)
        if d.startswith("epoch=")
    }
    # clean up dirs from a crash after ledger write
    for e in on_disk & folded:
        shutil.rmtree(os.path.join(root, f"epoch={e}"))
    todo = sorted(on_disk - folded)
    if not todo:
        return 0
    base_path = os.path.join(index_path, "assigned")
    merged = live_assigned(spark, index_path).dropDuplicates(["vec_id"])
    tmp_path = base_path + ".tmp-swap"
    merged.write.mode("overwrite").partitionBy("cell").parquet(tmp_path)
    if os.path.exists(base_path):
        shutil.rmtree(base_path)
    os.rename(tmp_path, base_path)
    ledger = {"folded": sorted(folded | set(todo))}
    tmp = os.path.join(index_path, _COMPACT_LEDGER + ".tmp")
    with open(tmp, "w") as f:
        json.dump(ledger, f)
    os.replace(tmp, os.path.join(index_path, _COMPACT_LEDGER))
    for e in todo:
        shutil.rmtree(os.path.join(root, f"epoch={e}"))
    return len(todo)


def ann_files(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    checkpoint: str,
    dim: int,
    schema: str = "vec_id long, embedding array<float>",
):
    """Drive the maintainer through the real streaming engine off a file
    source (the in-container stand-in for Kafka); availableNow drains
    what exists and stops."""
    fn = make_ann_batch_fn(index_path, dim)
    raw = spark.readStream.schema(schema).json(source_dir)
    return (
        raw.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
