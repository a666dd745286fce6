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

from basic_data_pipeline_spark.streaming import swapstore as _swapstore


@_swapstore.leased("location", owner="batch:maintenance.atomic_overwrite")
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


def assert_clean_stream_ledger(index_path: str) -> None:
    """Refuse maintenance while a guarded stream's intent marker is
    pending: the index may hold a crashed epoch's PARTIAL append, and a
    rewrite would fold those rows in beyond the reach of the watermark
    rebuild (run the matching streaming.rebuild helper first)."""
    ledger_path = os.path.join(index_path, "_stream_ledger.json")
    if not os.path.exists(ledger_path):
        return
    import json

    with open(ledger_path) as f:
        for tag, state in json.load(f).items():
            if isinstance(state, dict) and state.get("intent") is not None:
                raise RuntimeError(
                    f"stream {tag!r} crashed mid-append (intent epoch "
                    f"{state['intent']}) — run the matching "
                    "streaming.rebuild helper before compacting"
                )


@_swapstore.leased("src_path", owner="batch:maintenance.compact_bucketed")
def compact_bucketed(
    spark: SparkSession,
    src_path: str,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    fold=None,
) -> dict:
    """Rewrite one BUCKETED index table into exactly ``n_buckets`` files
    and atomically swap it in. Every incremental index here appends
    ``n_buckets`` files per epoch (bucketed writes emit one file per
    bucket per task), so a long-lived stream accretes files linearly in
    epochs — this is the scheduled maintenance that undoes it.

    ``compact_parquet`` must NEVER run on these directories: Spark
    derives each file's bucket id from its NAME, so a plain rewrite
    keeps reading fine but silently breaks the zero-exchange bucketed
    joins' co-location assumption — the rewrite has to go back through
    a bucketed writer, which is exactly what this does (repartitioned
    to ``n_buckets`` on the bucket key first, so each task owns one
    bucket and writes ONE file). ``fold`` optionally transforms the
    frame before the rewrite (the df delta log folds to one row per
    term). A leftover ``.rebuild`` temp from a crashed compaction is
    finished or discarded on entry (the rebuild-swap contract).
    Returns {rows, files_before, files_after}."""
    from pyspark.sql import functions as F

    from basic_data_pipeline_spark.sources import tables as _tables

    tmp_path = src_path + ".rebuild"
    if os.path.exists(tmp_path):
        if not os.path.exists(src_path) and os.path.exists(
            os.path.join(tmp_path, "_SUCCESS")
        ):
            os.rename(tmp_path, src_path)
        else:
            shutil.rmtree(tmp_path)
    files_before = parquet_layout(src_path)["n_files"]
    df = spark.read.parquet(src_path)
    out = fold(df) if fold is not None else df
    out = out.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
    tmp_table = table + "_cp"
    spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
    _tables.write_bucketed(
        out, tmp_table, bucket_cols, n_buckets,
        sort_cols=sort_cols, path=tmp_path,
    )
    shutil.rmtree(src_path)
    os.rename(tmp_path, src_path)
    spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
    spark.catalog.refreshByPath(src_path)
    if spark.catalog.tableExists(table):
        spark.sql(f"REFRESH TABLE {table}")
    return {
        "rows": spark.read.parquet(src_path).count(),
        "files_before": files_before,
        "files_after": parquet_layout(src_path)["n_files"],
    }


# ---------------------------------------------------------------------------
# Z-order layout: multi-dimensional clustering for min/max pruning
# ---------------------------------------------------------------------------


def _zvalue(scaled, bits: int):
    """Interleave the bits of the scaled dimension values — Morton
    (Z-curve) order. Pure shift/mask expressions, fully codegen'd."""
    from pyspark.sql import functions as F

    ndim = len(scaled)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, c in enumerate(scaled):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * ndim + d))
    return z


def zorder_write(
    df: DataFrame,
    cols: list[str],
    location: str,
    n_files: int = 8,
    bits: int = 12,
) -> None:
    """Rewrite a table Z-ORDERED on `cols`: each column is min/max-scaled
    to a `bits`-bit integer, the per-row bit-interleaved Morton code is
    range-partitioned into `n_files` files and sorted within each. Rows
    close in ALL `cols` land in the same file, so every file's parquet
    min/max stats are tight in every clustered dimension at once — a
    single-column sort gives tight stats in that column only, leaving
    scans filtered on the others to read everything.

    This is what makes multi-dimensional predicate pruning work at
    100 TB: row-group/file skipping is driven by footer stats, and
    Z-order bounds each file's hyper-rectangle volume instead of one
    edge. (Same layout technique Delta/Iceberg expose as OPTIMIZE
    ZORDER; implemented here with plain DataFrame ops — no table format
    required.) The min/max pre-pass is one bounded aggregate (2×|cols|
    values to the driver — control plane, not data). NULLs scale to 0 so
    they cluster together at the curve origin. `bits`×|cols| must stay
    ≤ 63 (long z-value)."""
    from pyspark.sql import functions as F

    if not cols:
        raise ValueError("zorder_write needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must fit in a long (<= 63)")
    lo_hi = df.agg(
        *[F.min(c).cast("double").alias(f"_lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_hi_{c}") for c in cols],
    ).first()
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo, hi = lo_hi[f"_lo_{c}"], lo_hi[f"_hi_{c}"]
        span = (hi - lo) if (hi is not None and lo is not None and hi > lo) else 1.0
        scaled.append(
            F.coalesce(
                F.floor(
                    (F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * top
                ).cast("long"),
                F.lit(0).cast("long"),
            )
        )
    atomic_overwrite(
        df.withColumn("_z", _zvalue(scaled, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z"),
        location,
    )


def file_stat_volumes(
    spark: SparkSession, location: str, cols: list[str]
) -> DataFrame:
    """Per-file min/max width of each column, normalized by the global
    span — the quantity min/max pruning depends on (a predicate on any
    `col` skips a file iff the file's [min,max] misses the value). Used
    to MEASURE a layout: mean normalized width ≪ 1 in every dimension ⇒
    multi-dim pruning works; a random layout shows ≈ 1."""
    from pyspark.sql import functions as F

    d = spark.read.parquet(location).select(
        F.input_file_name().alias("_f"), *cols
    )
    per_file = d.groupBy("_f").agg(
        *[F.min(c).cast("double").alias(f"_lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_hi_{c}") for c in cols],
    )
    glob_ = d.agg(
        *[
            (F.max(F.col(c).cast("double")) - F.min(F.col(c).cast("double"))).alias(
                f"_span_{c}"
            )
            for c in cols
        ]
    )
    out = per_file.crossJoin(F.broadcast(glob_))
    for c in cols:
        out = out.withColumn(
            f"width_{c}",
            (F.col(f"_hi_{c}") - F.col(f"_lo_{c}"))
            / F.when(F.col(f"_span_{c}") > 0, F.col(f"_span_{c}")).otherwise(
                F.lit(1.0)
            ),
        )
    return out.select("_f", *[f"width_{c}" for c in cols])
