"""Z-order layout: Morton-code correctness, row preservation, and the
measurable pruning property — per-file min/max widths shrink in EVERY
clustered dimension, which a single-column sort cannot do."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import maintenance


def test_zvalue_interleave_known_bits(spark):
    # x=3 (11₂) at even bit positions, y=1 (01₂) at odd → z = 0111₂ = 7
    df = spark.range(1).select(
        maintenance._zvalue([F.lit(3).cast("long"), F.lit(1).cast("long")], 2).alias("z")
    )
    assert df.first()["z"] == 7
    # one dimension degenerates to the identity (z == value)
    df = spark.range(1).select(
        maintenance._zvalue([F.lit(37).cast("long")], 12).alias("z")
    )
    assert df.first()["z"] == 37


def test_zorder_write_preserves_rows(spark, tmp_path):
    loc = str(tmp_path / "zt")
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") * 37 % 101).alias("x"),
        (F.col("id") * 61 % 97).alias("y"),
    )
    maintenance.zorder_write(df, ["x", "y"], loc, n_files=4)
    back = spark.read.parquet(loc)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_zorder_tightens_all_dims_vs_random(spark, tmp_path):
    """On a uniform 2-D grid, Z-order makes every file's normalized
    min/max width small in BOTH dims; a hash-random layout leaves both
    ≈ 1 (no pruning possible)."""
    n = 4096
    grid = spark.range(n).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    zloc, rloc = str(tmp_path / "z"), str(tmp_path / "r")
    maintenance.zorder_write(grid, ["x", "y"], zloc, n_files=16)
    grid.repartition(16).write.parquet(rloc)

    def mean_widths(loc):
        st = maintenance.file_stat_volumes(spark, loc, ["x", "y"])
        row = st.agg(
            F.avg("width_x").alias("wx"), F.avg("width_y").alias("wy")
        ).first()
        return row["wx"], row["wy"]

    zx, zy = mean_widths(zloc)
    rx, ry = mean_widths(rloc)
    assert zx < 0.6 and zy < 0.6, f"z-order not tight: {zx}, {zy}"
    assert rx > 0.8 and ry > 0.8, f"random layout unexpectedly tight: {rx}, {ry}"
    # and z-order beats random by a wide margin in both dims
    assert zx < rx / 2 and zy < ry / 2


def test_zorder_param_validation(spark, tmp_path):
    df = spark.range(10).select(F.col("id").alias("x"))
    with pytest.raises(ValueError):
        maintenance.zorder_write(df, [], str(tmp_path / "a"))
    with pytest.raises(ValueError):
        maintenance.zorder_write(df, ["x"] * 8, str(tmp_path / "b"), bits=12)


def test_zorder_constant_and_null_columns(spark, tmp_path):
    """Degenerate spans (constant column) and NULLs don't crash: NULLs
    scale to the curve origin."""
    loc = str(tmp_path / "zc")
    df = spark.range(100).select(
        F.lit(5).alias("x"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("y"),
    )
    maintenance.zorder_write(df, ["x", "y"], loc, n_files=2)
    assert spark.read.parquet(loc).count() == 100
