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


def hourly_rollup(events: DataFrame) -> DataFrame:
    """events(ts, event_type, value) → additive hour×type rollup with the
    (sum, count) pair so averages stay derivable downstream."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("value_sum_dec"),
        )
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
    sums of counts. Must equal aggregating the raw facts directly —
    asserted in tests and by the oracle of `rollup_hourly_to_daily`."""
    return (
        rollup.groupBy(
            F.to_date("hour").alias("date"), F.col("event_type")
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum(F.col("value_sum").cast("decimal(38,6)"))
            .cast("double")
            .alias("value_sum"),
        )
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
