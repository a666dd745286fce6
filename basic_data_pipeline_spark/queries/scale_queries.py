"""Scale-technique operators surfaced as oracle-checked queries:
hierarchical rollup re-aggregation, salted skew-proof aggregation,
exact quantiles. These are the plan shapes that keep working when the
input grows 1000× — each oracle proves the technique changes the
EXECUTION, not the answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from basic_data_pipeline_spark.catalog import load_table
from basic_data_pipeline_spark.operators import rollup
from basic_data_pipeline_spark.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return load_table(spark, sf_dir, name)


@query(
    "rollup_hourly_to_daily",
    oracle="""
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS date, event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS value_sum
    FROM events GROUP BY 1, 2
    """,
)
def rollup_hourly_to_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level additive rollup: raw events → hour×type partials →
    day×type. The oracle aggregates the RAW facts directly, proving the
    hierarchical path is lossless (the additivity invariant continuous
    aggregates depend on). At 100 TB the hourly level is materialized
    once (operators/rollup.py `materialize_rollup`) and every coarser
    query reads it instead of the facts."""
    return rollup.reaggregate_daily(
        rollup.hourly_rollup(_t(spark, sf_dir, "events"))
    )


@query(
    "agg_salted_skew",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS value_sum
    FROM events GROUP BY event_type
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over a 5-value key — the skew shape
    where a plain groupBy leaves all but 5 reducers idle (AQE splits
    skewed JOIN partitions, not aggregation keys). Decimal accumulation
    makes the salted result bit-equal to the direct oracle sum no matter
    how the salt split the rows."""
    return rollup.salted_sum(_t(spark, sf_dir, "events"), "event_type", "value")


@query(
    "agg_percentiles",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5)  AS p50,
           quantile_cont(value, 0.9)  AS p90,
           quantile_cont(value, 0.99) AS p99
    FROM events GROUP BY event_type
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear interpolation). The scale path
    swaps in `approx_percentile` (t-digest sketch, mergeable, one pass)
    when exactness can yield — kept exact here so the oracle can check
    values."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.9).alias("p90"),
        F.percentile("value", 0.99).alias("p99"),
    )
