"""Guarded-stream throughput probe (r10 verdict item #3): stream == batch
is proven per family (tests), but the per-micro-batch COST of the guarded
skeleton — lease renew + ledger read/write + intent marker + epoch output
+ the index append itself — has never been timed at a big tier. This
probe drives 2-3 index families' foreachBatch bodies directly over
fixed-size micro-batches at two index sizes and reports per-epoch walls:

* WITHIN a tier, the per-epoch wall should be FLAT (append-shaped — no
  cost that grows with epoch number);
* ACROSS tiers (the 16× vs 64× base build), a flat delta isolates the
  index-size effect on an append (the dedup candidate join reads the
  index bucketed-in-place; retrieval appends never read the index; the
  ANN assign scores against the base centroid table).

Batches are the probe replicas' natural shards (one copy = 5000 docs /
2000 vectors, ids share the copy's 1e9 block — monotone across epochs,
the incremental-index id convention). The perturbed replicas are used so
every copy carries unique content and the dedup index genuinely grows
per epoch (unperturbed would make every batch 100% duplicates and
append nothing).

    SPARK_GRAFT_STREAM_TIERS="16,64" SPARK_GRAFT_STREAM_EPOCHS=12 \
        python tools/probe_stream_throughput.py [dedup retrieval ann]

Output: one line per (family, tier, epoch) wall + a flatness summary
(mean of first 3 vs last 3 epochs). Results are recorded in SCALING.md,
not asserted — a measurement harness, not a gate.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from basic_data_pipeline_spark import get_spark
from basic_data_pipeline_spark.operators import incremental
from basic_data_pipeline_spark.operators import incremental_retrieval as IR
from basic_data_pipeline_spark.operators import similarity
from basic_data_pipeline_spark.streaming import (
    ann_stream,
    dedup_stream,
    retrieval_stream,
    swapstore,
)

SHIFT = 1_000_000_000
DOCS_PER_COPY = 5000
TIERS = [
    int(t) for t in os.environ.get("SPARK_GRAFT_STREAM_TIERS", "16,64").split(",")
]
N_EPOCHS = int(os.environ.get("SPARK_GRAFT_STREAM_EPOCHS", "12"))
WORK = os.environ.get("SPARK_GRAFT_STREAM_WORK", "/tmp/spark_graft_stream_probe")
DIM = 64


def _copies(df, col, lo, hi):
    """Rows of copies [lo, hi) — a pushed-down range filter per shard."""
    return df.filter(
        (F.col(col) >= lo * SHIFT) & (F.col(col) < hi * SHIFT)
    )


def _flat(walls: list[float]) -> str:
    head = sum(walls[:3]) / min(3, len(walls))
    tail = sum(walls[-3:]) / min(3, len(walls))
    return f"head3={head:.2f}s tail3={tail:.2f}s tail/head={tail / head:.2f}"


def _drive(label: str, tier: int, fn, batches, start_epoch: int = 0) -> list[float]:
    walls = []
    for i, b in enumerate(batches):
        e = start_epoch + i
        t0 = time.perf_counter()
        fn(b, e)
        walls.append(round(time.perf_counter() - t0, 2))
        print(f"{label:10s} {tier:3d}x epoch={e:3d} wall={walls[-1]:7.2f}s", flush=True)
    print(f"{label:10s} {tier:3d}x FLATNESS {_flat(walls)}", flush=True)
    return walls


def _compact_then_resume(label, tier, idx, fn, compact, remake, batches, e0):
    """The small-file accretion check: every bucketed append lays down
    n_buckets more files, so a long stream's per-epoch wall drifts up
    with FILE COUNT (not data size). Stop the stream (release its
    lease), run the family's bucket-preserving compaction, restart, and
    drive the remaining epochs — if the drift is accretion, the
    post-compact wall returns to the early-epoch floor."""
    swapstore.release_writer(fn)
    t0 = time.perf_counter()
    compact()
    print(
        f"{label:10s} {tier:3d}x COMPACT wall={time.perf_counter() - t0:7.2f}s",
        flush=True,
    )
    fn2 = remake()
    walls = _drive(label + "+c", tier, fn2, batches, start_epoch=e0)
    swapstore.release_writer(fn2)
    return walls


def main() -> None:
    families = sys.argv[1:] or ["dedup", "retrieval", "ann"]
    spark = get_spark("stream_throughput_probe")
    for tier in TIERS:
        d = f"/tmp/spark_graft_sf{tier}x_perturbed"
        if not os.path.isdir(d):
            raise SystemExit(f"missing probe dir {d} (tools/scale_probe.py)")
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        vecs = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        n_base = tier - N_EPOCHS
        if n_base < 1:
            raise SystemExit(f"tier {tier} too small for {N_EPOCHS} epochs")
        doc_batches = [
            _copies(docs, "doc_id", c, c + 1) for c in range(n_base, tier)
        ]
        vec_batches = [
            _copies(vecs, "vec_id", c, c + 1) for c in range(n_base, tier)
        ]

        if "dedup" in families:
            idx = os.path.join(WORK, f"dedup_{tier}x")
            shutil.rmtree(idx, ignore_errors=True)
            swapstore.release_lease(idx, force=True)
            t0 = time.perf_counter()
            incremental.build_index(
                spark, _copies(docs, "doc_id", 0, n_base), idx
            )
            print(f"dedup      {tier:3d}x base build ({n_base} copies): "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            out = os.path.join(idx, "_out")
            fn = dedup_stream.make_dedup_batch_fn(idx, out)
            _drive("dedup", tier, fn, doc_batches[:-3])
            _compact_then_resume(
                "dedup", tier, idx, fn,
                lambda: incremental.compact_index(spark, idx),
                lambda: dedup_stream.make_dedup_batch_fn(idx, out),
                doc_batches[-3:], len(doc_batches) - 3,
            )

        if "retrieval" in families:
            idx = os.path.join(WORK, f"retr_{tier}x")
            shutil.rmtree(idx, ignore_errors=True)
            swapstore.release_lease(idx, force=True)
            t0 = time.perf_counter()
            IR.build_retrieval_index(
                spark, _copies(docs, "doc_id", 0, n_base), idx
            )
            print(f"retrieval  {tier:3d}x base build ({n_base} copies): "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            out = os.path.join(idx, "_out")
            fn = retrieval_stream.make_retrieval_batch_fn(idx, out)
            _drive("retrieval", tier, fn, doc_batches[:-3])
            _compact_then_resume(
                "retrieval", tier, idx, fn,
                lambda: IR.compact_index(spark, idx),
                lambda: retrieval_stream.make_retrieval_batch_fn(idx, out),
                doc_batches[-3:], len(doc_batches) - 3,
            )

        if "ann" in families:
            idx = os.path.join(WORK, f"ann_{tier}x")
            shutil.rmtree(idx, ignore_errors=True)
            swapstore.release_lease(idx, force=True)
            t0 = time.perf_counter()
            similarity.ivf_build_index(
                _copies(vecs, "vec_id", 0, n_base), idx, DIM
            )
            print(f"ann        {tier:3d}x base build ({n_base} copies): "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            fn = ann_stream.make_ann_batch_fn(idx, DIM)
            _drive("ann", tier, fn, vec_batches[:-3])
            _compact_then_resume(
                "ann", tier, idx, fn,
                lambda: ann_stream.compact_epochs(spark, idx),
                lambda: ann_stream.make_ann_batch_fn(idx, DIM),
                vec_batches[-3:], len(vec_batches) - 3,
            )
    spark.stop()


if __name__ == "__main__":
    main()
