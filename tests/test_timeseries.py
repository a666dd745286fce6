"""Gap filling (operators/timeseries.py) — pinned against a serial
Python reference over hand-built sparse series."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import timeseries as TS

BS = 3600  # 1-hour buckets


def _series(spark):
    rows = [
        # key 'a': observations at buckets 0, 3, 4 (of 0..5)
        ("a", 0 * BS, 10.0),
        ("a", 3 * BS, 40.0),
        ("a", 4 * BS, 20.0),
        # key 'b': single observation in the middle
        ("b", 2 * BS, 5.0),
    ]
    return spark.createDataFrame(rows, "k string, b long, v double")


BOUNDS = (0, 5 * BS)


def _collect(df):
    return {
        (r["k"], r["b"]): (r["v"], r["filled"]) for r in df.collect()
    }


def test_gapfill_grid_is_dense(spark):
    out = TS.gapfill(_series(spark), "k", "b", "v", BS, "null", BOUNDS)
    got = _collect(out)
    assert len(got) == 2 * 6
    assert got[("a", 0)] == (10.0, False)
    assert got[("a", BS)] == (None, True)


def test_gapfill_locf(spark):
    got = _collect(
        TS.gapfill(_series(spark), "k", "b", "v", BS, "locf", BOUNDS)
    )
    assert [got[("a", i * BS)][0] for i in range(6)] == [
        10.0, 10.0, 10.0, 40.0, 20.0, 20.0
    ]
    # leading holes stay null; trailing carry forward
    assert [got[("b", i * BS)][0] for i in range(6)] == [
        None, None, 5.0, 5.0, 5.0, 5.0
    ]


def test_gapfill_linear(spark):
    got = _collect(
        TS.gapfill(_series(spark), "k", "b", "v", BS, "linear", BOUNDS)
    )
    assert got[("a", 1 * BS)][0] == pytest.approx(20.0)  # 10 -> 40 at 1/3
    assert got[("a", 2 * BS)][0] == pytest.approx(30.0)
    assert got[("a", 4 * BS)][0] == 20.0  # observed passes through
    # edges (no neighbor on one side) stay null
    assert got[("a", 5 * BS)][0] is None
    assert got[("b", 0)][0] is None and got[("b", 5 * BS)][0] is None


def test_gapfill_zero_and_default_bounds(spark):
    out = TS.gapfill(_series(spark), "k", "b", "v", BS, "zero")
    got = _collect(out)
    # default bounds = global [min, max] observed bucket = [0, 4h]
    assert len(got) == 2 * 5
    assert got[("b", 0)] == (0.0, True)


def test_gapfill_partitioning_invariant(spark):
    s = _series(spark)
    a = _collect(TS.gapfill(s, "k", "b", "v", BS, "linear", BOUNDS))
    b = _collect(
        TS.gapfill(s.repartition(7), "k", "b", "v", BS, "linear", BOUNDS)
    )
    assert a == b


def test_time_bucket_floors_to_epoch_multiple(spark):
    df = spark.createDataFrame(
        [("2024-01-01 10:59:59",), ("2024-01-01 11:00:00",)], "t string"
    ).select(F.to_timestamp("t").alias("ts"))
    got = [r[0] for r in df.select(TS.time_bucket(F.col("ts"), 3600)).collect()]
    assert got[0] + 3600 == got[1]
    assert all(g % 3600 == 0 for g in got)


def test_gapfill_validates(spark):
    s = _series(spark)
    with pytest.raises(ValueError):
        TS.gapfill(s, "k", "b", "v", BS, "cubic")
    with pytest.raises(ValueError):
        TS.gapfill(s, "k", "b", "v", BS, "locf", (1, 2 * BS))
