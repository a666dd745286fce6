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
import shutil

from pyspark.sql import DataFrame, SparkSession


def atomic_overwrite(
    df: DataFrame,
    location: str,
    sort_cols: list[str] | None = None,
    n_parts: int | None = None,
) -> None:
    """Replace a parquet directory with `df` via write-to-temp + rename.

    The input plan may READ the same directory it replaces; a
    cache()-then-overwrite is NOT fault-tolerant there — a lost cached
    block during the overwrite would recompute from the half-deleted
    directory, corrupting or losing data. Writing to a sibling temp dir
    and renaming over the target never has both the source and a partial
    destination live at once. The rename swap is atomic on a real
    filesystem; object stores would use a commit protocol instead."""
    tmp_loc = f"{location}.tmp-swap"
    out = df.repartition(n_parts) if n_parts else df
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").parquet(tmp_loc)
    if os.path.exists(location):
        shutil.rmtree(location)
    os.rename(tmp_loc, location)


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

    The rewrite goes through `atomic_overwrite` (write-to-temp + rename):
    the plan reads the same directory it replaces, and the temp swap stays
    fault-tolerant where a cache()+overwrite would not be. Partition
    count = ceil(bytes/target): size-based, so the same call works on a
    100 GB or a 100 TB directory."""
    before = parquet_layout(path)
    n_parts = max(1, -(-before["total_bytes"] // target_file_bytes))
    atomic_overwrite(
        spark.read.parquet(path), path, sort_cols=sort_cols, n_parts=n_parts
    )
    return parquet_layout(path)
