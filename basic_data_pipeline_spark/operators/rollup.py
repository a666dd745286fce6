"""Hierarchical rollup (hypertable-style continuous aggregation) and
skew-mitigation operators.

Rollups: facts aggregate once into a fine-grained additive rollup
(hour × key), materialized partitioned-by-date; every coarser question
(day/week/total) re-aggregates the rollup, never the raw facts. At 100 TB
of events the hourly rollup is ~10⁴-10⁵× smaller than its input, so the
second-level aggregation is interactive. Correct ONLY for additive/
semi-additive measures — count/sum/min/max re-aggregate; avg must be
carried as (sum, count); distinct must be carried as a sketch (HLL).

Salting: a groupBy whose key cardinality is far below the cluster's
parallelism (or whose key distribution is heavy-tailed) bottlenecks on
the hot key's single reducer. Salting splits each key into n_salts
sub-keys for the first (wide) aggregation, then combines the partials in
a second (tiny) aggregation — trading one extra small shuffle for
balanced reducers. AQE's skew handling only splits JOIN partitions, not
aggregation keys; salting is the aggregation-side equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame, with_sketches: bool = False) -> DataFrame:
    """events(ts, event_type, value) → additive hour×type rollup with the
    (sum, count) pair so averages stay derivable downstream.

    `with_sketches` additionally carries MERGEABLE sketches — the piece
    that makes non-additive measures survive re-aggregation: an HLL
    sketch of user_id (distinct users re-aggregate by sketch union, never
    by rescanning facts) and a KLL quantile sketch of value (percentiles
    re-aggregate by sketch merge). Both are Apache DataSketches built into
    Spark (hll_sketch_agg / kll_sketch_agg_double); the rollup row stays
    O(kB) regardless of input size, so a 100 TB fact table rolls up to a
    sketch table the next aggregation reads in milliseconds."""
    aggs = [
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("value_sum_dec"),
    ]
    if with_sketches:
        aggs += [
            F.hll_sketch_agg("user_id").alias("users_hll"),
            F.kll_sketch_agg_double("value").alias("value_kll"),
        ]
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(*aggs)
        .withColumn("value_sum", F.col("value_sum_dec").cast("double"))
        .drop("value_sum_dec")
    )


def materialize_rollup(events: DataFrame, path: str) -> None:
    """Write the hourly rollup partitioned by date — the pruning unit for
    time-ranged re-aggregation."""
    (
        hourly_rollup(events)
        .withColumn("date", F.to_date("hour"))
        .write.mode("overwrite")
        .partitionBy("date")
        .parquet(path)
    )


def reaggregate_daily(rollup: DataFrame) -> DataFrame:
    """hour×type rollup → day×type. Additive re-aggregation: sums of sums,
    sums of counts; if the rollup carries sketches (hourly_rollup
    with_sketches=True), distinct users re-aggregate by HLL union and
    value quantiles by KLL merge — the re-aggregated estimates are
    IDENTICAL to sketching the raw facts directly (sketch merge is
    lossless w.r.t. the sketch state), asserted in test_rollup.py. Must
    equal aggregating the raw facts directly — asserted in tests and by
    the oracle of `rollup_hourly_to_daily`."""
    aggs = [
        F.sum("n").alias("n"),
        F.sum(F.col("value_sum").cast("decimal(38,6)"))
        .cast("double")
        .alias("value_sum"),
    ]
    out_cols = []
    if "users_hll" in rollup.columns:
        aggs.append(F.hll_union_agg("users_hll").alias("users_hll"))
        out_cols.append(
            F.hll_sketch_estimate("users_hll").alias("distinct_users_est")
        )
    drop_cols = []
    if "value_kll" in rollup.columns:
        # kll_sketch_merge_double is a binary scalar (no union aggregate
        # exists): fold it over the day's hourly sketches — bounded at 24
        # elements per group, so the fold is O(1) per output row.
        aggs.append(F.collect_list("value_kll").alias("_klls"))
        merged = F.expr(
            "aggregate(slice(_klls, 2, size(_klls)), _klls[0],"
            " (acc, x) -> kll_sketch_merge_double(acc, x))"
        )
        out_cols += [
            F.kll_sketch_get_quantile_double(merged, F.lit(0.5)).alias(
                "value_p50_est"
            ),
            F.kll_sketch_get_quantile_double(merged, F.lit(0.95)).alias(
                "value_p95_est"
            ),
        ]
        drop_cols.append("_klls")
    daily = rollup.groupBy(
        F.to_date("hour").alias("date"), F.col("event_type")
    ).agg(*aggs)
    return (
        daily.select("*", *out_cols).drop(*drop_cols) if out_cols else daily
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 32,
) -> DataFrame:
    """Skew-proof equi-join: the fact side salts its key into n_salts
    sub-keys; the (small) dim side replicates ×n_salts so every sub-key
    finds its match. A hot key's rows then land on n_salts reducers
    instead of one. Use when AQE's skew-join split isn't available
    (non-shuffle-join plans) or the skew is extreme; the dim replication
    cost is |dim|×n_salts — meant for dimension-sized right sides."""
    salted_facts = facts.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_facts.join(replicated_dim, on=[key, "_salt"]).drop("_salt")


def salted_sum(
    df: DataFrame, key: str, value: str, n_salts: int = 32
) -> DataFrame:
    """Skew-proof groupBy(key).agg(count, sum(value)): phase 1 aggregates
    (key, salt) — hot keys spread over n_salts reducers; phase 2 combines
    the ≤ n_salts×|keys| partials. Decimal accumulation keeps the result
    bit-equal to the unsalted (and oracle) sum regardless of how rows
    were split."""
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_n"),
        F.sum(F.col(value).cast("decimal(38,6)")).alias("_s"),
    )
    return (
        partial.groupBy(key)
        .agg(
            F.sum("_n").alias("n"),
            F.sum("_s").cast("double").alias("value_sum"),
        )
    )


def auto_salted_sum(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 32,
    top_k: int = 64,
) -> DataFrame:
    """Skew-ADAPTIVE groupBy(key).agg(count, sum): detect the heavy keys
    with a Misra-Gries sketch (one partition-parallel scan, #partitions×k
    counter rows — operators/sketches.py), then salt ONLY those keys.

    Blanket salting (salted_sum) taxes every key with a second
    aggregation level; AQE's skew handling only splits JOIN partitions.
    This composition gets both properties: cold keys aggregate in one
    hop exactly as a plain groupBy, the ≤ top_k detected heavy keys
    spread over n_salts reducers, and the result is bit-equal to the
    unsalted sum however the heavy set was detected (salting any subset
    is correctness-neutral — the MG sketch's partition-dependence can
    change WHICH keys get salted, never the sums). The heavy-key set is
    control-plane data (≤ top_k rows) and broadcasts as a literal."""
    from basic_data_pipeline_spark.operators.sketches import heavy_hitters

    hot = [
        r["item"]
        for r in heavy_hitters(df.select(F.col(key)), key, top_k).collect()
    ]
    salt = (
        F.when(
            F.col(key).isin(hot),
            (F.rand(seed=42) * n_salts).cast("int"),
        ).otherwise(F.lit(0))
        if hot
        else F.lit(0)
    )
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(
            F.count("*").alias("_n"),
            F.sum(F.col(value).cast("decimal(38,6)")).alias("_s"),
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n"),
        F.sum("_s").cast("double").alias("value_sum"),
    )
