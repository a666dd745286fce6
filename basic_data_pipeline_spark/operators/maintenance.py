"""Table-maintenance operators: small-file compaction and layout stats.

A streaming sink (streaming/ingest.py appends one file set per
micro-batch) or any high-frequency writer accretes small files; at scale
the resulting per-file open/footer costs dominate scans long before data
size does. Compaction rewrites a parquet directory into size-targeted
files — the maintenance job every production lake schedules. (The
reference's ClickHouse sink gets this from MergeTree background merges;
parquet directories need it done explicitly.)
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession


def parquet_layout(path: str) -> dict:
    """File-level layout stats for a parquet directory (recursive —
    includes hive-style partition subdirectories)."""
    files = [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]
    sizes = [os.path.getsize(f) for f in files]
    return {
        "n_files": len(files),
        "total_bytes": sum(sizes),
        "avg_bytes": (sum(sizes) // len(sizes)) if sizes else 0,
    }


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Rewrite `path` into ~target_file_bytes files (at least one),
    optionally re-sorting within files to restore row-group stats
    data-skipping after many unordered appends. Returns the new layout.

    The input is materialized before the overwrite (the plan reads the
    same directory it replaces). Partition count = ceil(bytes/target):
    size-based, so the same call works on a 100 GB or a 100 TB directory."""
    before = parquet_layout(path)
    n_parts = max(1, -(-before["total_bytes"] // target_file_bytes))
    df = spark.read.parquet(path).cache()
    df.count()
    out = df.repartition(n_parts)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").parquet(path)
    df.unpersist()
    return parquet_layout(path)
