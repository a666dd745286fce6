"""Binned range join: equivalence with the naive theta join, plan shape
(equi-join, never a nested-loop/cartesian product), and bin-width
invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators.rangejoin import (
    binned_range_join,
    interval_overlap_join,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def points(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select(F.col("event_id").alias("pid"), F.col("value").alias("p"))
        .cache()
    )


@pytest.fixture(scope="module")
def intervals(spark):
    # synthetic intervals from orders: lo/hi derived so lengths vary
    return (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select(
            F.col("o_orderkey").alias("iid"),
            (F.col("o_totalprice") % 80).alias("lo"),
            (F.col("o_totalprice") % 80 + F.col("o_orderkey") % 7).alias("hi"),
        )
        .cache()
    )


def _naive(points, intervals):
    return points.crossJoin(intervals).where(
        (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi"))
    )


def _pairs(df):
    return {(r["pid"], r["iid"]) for r in df.select("pid", "iid").collect()}


def test_binned_equals_naive_across_widths(points, intervals):
    want = _pairs(_naive(points, intervals))
    assert want, "fixture must produce matches"
    for w in (1.0, 3.0, 10.0, 1000.0):
        got = _pairs(binned_range_join(points, intervals, "p", "lo", "hi", w))
        assert got == want, f"bin_width={w}"


def test_binned_semi_join(points, intervals):
    want = {r["pid"] for r in _naive(points, intervals).select("pid").collect()}
    semi = binned_range_join(
        points, intervals, "p", "lo", "hi", 5.0, how="left_semi"
    )
    assert {r["pid"] for r in semi.collect()} == want
    assert semi.columns == points.columns
    assert semi.count() == len(want), "semi join must not duplicate rows"


def test_null_and_inverted_bounds_drop(spark):
    pts = spark.createDataFrame(
        [(1, 5.0), (2, None)], "pid long, p double"
    )
    iv = spark.createDataFrame(
        [(10, 0.0, 10.0), (11, None, 10.0), (12, 9.0, 1.0)],
        "iid long, lo double, hi double",
    )
    got = _pairs(binned_range_join(pts, iv, "p", "lo", "hi", 4.0))
    assert got == {(1, 10)}


def test_plan_is_equi_join_not_nested_loop(spark, points, intervals):
    """The whole point: with auto-broadcast off, the binned join must plan
    as a shuffle equi-join on the bin key — never BroadcastNestedLoopJoin
    or CartesianProduct (what a bare range predicate produces)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            binned_range_join(points, intervals, "p", "lo", "hi", 5.0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        naive_plan = (
            _naive(points, intervals)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin [_rj_bin" in plan or "ShuffledHashJoin [_rj_bin" in plan, plan
    # and the naive formulation really is the degenerate plan we avoid
    assert (
        "CartesianProduct" in naive_plan
        or "BroadcastNestedLoopJoin" in naive_plan
    )


def test_interval_overlap_equals_naive_no_duplicates(spark):
    left = spark.createDataFrame(
        [(i, float(i * 3 % 50), float(i * 3 % 50 + i % 11)) for i in range(200)],
        "lid long, llo double, lhi double",
    )
    right = spark.createDataFrame(
        [(j, float(j * 7 % 60), float(j * 7 % 60 + j % 5)) for j in range(150)],
        "rid long, rlo double, rhi double",
    )
    naive = left.crossJoin(right).where(
        (F.col("llo") <= F.col("rhi")) & (F.col("rlo") <= F.col("lhi"))
    )
    want = {(r["lid"], r["rid"]) for r in naive.collect()}
    for w in (2.0, 8.0, 100.0):
        got_rows = interval_overlap_join(
            left, right, "llo", "lhi", "rlo", "rhi", w
        ).collect()
        got = {(r["lid"], r["rid"]) for r in got_rows}
        assert got == want, f"bin_width={w}"
        assert len(got_rows) == len(want), f"duplicates at bin_width={w}"
