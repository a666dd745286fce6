"""Rollup materialization + salting invariants that the SQL oracle can't
cover: the partitioned on-disk rollup path and partition pruning on it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from basic_data_pipeline_spark.catalog import load_table
from basic_data_pipeline_spark.operators import rollup

SF = "/root/testdata/sf0.001"


def test_materialized_rollup_reaggregates_losslessly(spark, tmp_path):
    events = load_table(spark, SF, "events")
    path = str(tmp_path / "rollup")
    rollup.materialize_rollup(events, path)

    stored = spark.read.parquet(path)
    daily_from_disk = {
        (str(r["date"]), r["event_type"]): (r["n"], round(r["value_sum"], 6))
        for r in rollup.reaggregate_daily(stored).collect()
    }
    daily_direct = {
        (str(r["date"]), r["event_type"]): (r["n"], round(r["value_sum"], 6))
        for r in (
            events.groupBy(
                F.to_date("ts").alias("date"), "event_type"
            ).agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(38,6)"))
                .cast("double")
                .alias("value_sum"),
            )
        ).collect()
    }
    assert daily_from_disk == daily_direct


def test_rollup_partition_pruning(spark, tmp_path):
    events = load_table(spark, SF, "events")
    path = str(tmp_path / "rollup2")
    rollup.materialize_rollup(events, path)
    one_day = spark.read.parquet(path).filter(F.col("date") == "2024-01-05")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(date" in plan
    assert one_day.count() > 0


def test_salted_sum_matches_plain(spark):
    events = load_table(spark, SF, "events")
    salted = {
        r["event_type"]: (r["n"], r["value_sum"])
        for r in rollup.salted_sum(events, "event_type", "value").collect()
    }
    plain = {
        r["event_type"]: (r["n"], r["value_sum"])
        for r in events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("value_sum"),
        )
        .collect()
    }
    assert salted == plain
