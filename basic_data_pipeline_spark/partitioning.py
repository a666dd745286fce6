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
    same keys reuses the exchange); without, round-robin.

    The count is ``2·defaultParallelism + 1`` — deliberately NOT equal to
    ``spark.sql.shuffle.partitions`` (which every ENSURE_REQUIREMENTS
    exchange uses). If the child is already hash-partitioned on the same
    keys with the same count, the planner removes the user repartition as
    redundant, and the surviving ENSURE exchange is AQE-coalescible —
    measured: a ``distinct()`` feeding a per-key sequence explode
    collapsed to ONE task and ran the whole dense grid on one core
    (operators/timeseries.py gapfill, 22.5 s → 1.8 s at sf0.1 once the
    count stopped colliding). An off-by-one-odd count can never match a
    shuffle-partitions-sized exchange, so the fan-out always survives;
    the extra partitions only split compute-bound work finer, which is
    the point of the helper."""
    n = 2 * df.sparkSession.sparkContext.defaultParallelism + 1
    exprs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return df.repartition(n, *exprs) if exprs else df.repartition(n)
