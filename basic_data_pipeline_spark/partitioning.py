"""Partitioning helpers for CPU-heavy derived work.

The pattern: a scan of a *byte-small* input (one parquet file, a few MB)
produces 1-2 partitions, but downstream operators multiply work per row —
shingle explosion ×doc_len, hash families ×N, bit grids ×64, pairwise
distance folds. Left alone, all of that runs on the scan's partitions; and
a bare ``repartition(col)`` doesn't fix it because AQE's partition
coalescing sees a few MB of shuffle bytes and merges right back to 1.

``spread`` repartitions with an EXPLICIT partition count (user-specified
counts are exempt from AQE coalescing) — by key when downstream
aggregations want that key's hash partitioning anyway, round-robin
otherwise. At 100 TB inputs the same call is either a no-op-cost shuffle
that pre-positions the per-key aggregation, or simply keeps compute-bound
stages at cluster parallelism regardless of how the optimizer sized the
*byte*-based splits — the knob is compute per row, which Spark's
size-based planners cannot see.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, *cols: str | Column) -> DataFrame:
    """Repartition to cluster parallelism, exempt from AQE coalescing.

    With `cols`, hash-partitions by them (downstream groupBy/window on the
    same keys reuses the exchange); without, round-robin."""
    n = df.sparkSession.sparkContext.defaultParallelism
    exprs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return df.repartition(n, *exprs) if exprs else df.repartition(n)
