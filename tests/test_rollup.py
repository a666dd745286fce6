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


def test_sketch_rollup_reaggregates_distinct_and_quantiles(spark):
    """Mergeable-sketch rollup: daily distinct-user estimates via HLL
    union of hourly sketches must match sketching the raw facts (merge is
    lossless) and sit within HLL error of the exact count; KLL quantile
    estimates land within rank tolerance of exact percentiles."""
    from basic_data_pipeline_spark.catalog import load_table
    from basic_data_pipeline_spark.operators import rollup as R
    from pyspark.sql import functions as F

    e = load_table(spark, "/root/testdata/sf0.01", "events")
    daily = R.reaggregate_daily(R.hourly_rollup(e, with_sketches=True))
    got = {
        (str(r["date"]), r["event_type"]): r for r in daily.collect()
    }

    exact = {
        (str(r["date"]), r["event_type"]): r
        for r in e.groupBy(
            F.to_date(F.date_trunc("hour", "ts")).alias("date"), "event_type"
        )
        .agg(
            F.countDistinct("user_id").alias("du"),
            F.percentile("value", 0.5).alias("p50"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for k, ex in exact.items():
        est = got[k]["distinct_users_est"]
        assert abs(est - ex["du"]) <= max(2, 0.05 * ex["du"]), (k, est, ex["du"])
        # KLL @ default k: rank error ~1.3%; value-space slack derived via
        # the exact quantile at ±5% rank
        lo = ex["p50"] - abs(ex["p50"]) * 0.2 - 5
        hi = ex["p50"] + abs(ex["p50"]) * 0.2 + 5
        assert lo <= got[k]["value_p50_est"] <= hi, (k, got[k]["value_p50_est"], ex["p50"])

    # merge losslessness: daily-from-hourly HLL union == direct daily sketch
    direct = {
        (str(r["date"]), r["event_type"]): r["est"]
        for r in e.groupBy(
            F.to_date(F.date_trunc("hour", "ts")).alias("date"), "event_type"
        )
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    for k, v in direct.items():
        assert got[k]["distinct_users_est"] == v, (k, got[k]["distinct_users_est"], v)


def test_auto_salted_sum_exact_and_selective(spark):
    """auto_salted_sum == plain groupBy sums exactly (decimal path),
    under multiple partitionings; only detected-heavy keys get salted
    (cold keys aggregate in one hop — observable as a single partial row
    per cold key)."""
    from pyspark.sql import functions as F

    from basic_data_pipeline_spark.operators.rollup import auto_salted_sum

    rows = (
        [("hot", float(i % 7)) for i in range(4000)]
        + [(f"cold{i % 50}", float(i)) for i in range(500)]
    )
    df = spark.createDataFrame(rows, "k string, v double")
    want = {
        (r["k"]): (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("v").cast("decimal(38,6)")).cast("double").alias("s"),
        )
        .collect()
    }
    for parts in (1, 13):
        got = {
            r["k"]: (r["n"], r["value_sum"])
            for r in auto_salted_sum(
                df.repartition(parts), "k", "v", n_salts=8, top_k=4
            ).collect()
        }
        assert got == want
