"""Managed-table layer: partitioned and bucketed parquet tables.

The reference's sink layout is one ClickHouse MergeTree per table with an
ORDER BY key (consumer_to_file.py:145-150) — its read-locality device. The
Spark-native equivalents, in increasing strength:

- `write_partitioned`: hive-style directory partitioning on a low-
  cardinality column → partition PRUNING (a filtered scan never opens
  non-matching directories). The 100 TB default for time-series facts:
  partition by date, sort within partitions by the hot filter key so
  parquet row-group stats skip pages.
- `write_bucketed`: hash-bucket by join key via bucketBy + sortBy
  (saveAsTable — bucketing lives in the catalog). Two tables bucketed the
  SAME way on the SAME key join with NO exchange on either side: the
  shuffle is paid once at write time and amortized over every subsequent
  join/aggregation on that key. This is the co-location story the
  reference's per-table MergeTree cannot express at all.

`assert_no_shuffle_join` is the verifier: it inspects the executed plan
and fails if an Exchange feeds the join — used by tests so the
co-location claim is CHECKED, not asserted in prose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    table: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Directory-partitioned parquet table (catalog-registered). Filters
    on `partition_cols` prune whole directories; `sort_cols` order rows
    within each file so row-group min/max stats skip pages. `path` makes
    it an external table (default: the session warehouse)."""
    w = df
    if sort_cols:
        w = w.sortWithinPartitions(*sort_cols)
    writer = w.write.mode(mode).partitionBy(*partition_cols).format("parquet")
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Hash-bucketed (and optionally sorted) table — bucketing metadata
    lives in the catalog, so saveAsTable is required; `path` makes it an
    external table. Join two tables bucketed identically on the join key
    → zero-exchange join."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left: str, right: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key. With equal
    bucket counts Catalyst reports both sides' output partitioning as
    HashPartitioning(bucket key) and plans SortMergeJoin with NO Exchange.

    The merge hint pins the fact-fact plan shape: at test scale both
    sides fit the broadcast threshold and the planner would broadcast
    (ignoring bucketing entirely) — at 100 TB neither side broadcasts, so
    the hinted plan is the one whose scaling we're verifying."""
    return spark.table(left).hint("merge").join(
        spark.table(right), on=on, how=how
    )


def assert_no_shuffle_join(df: DataFrame) -> None:
    """Raise if the physical plan shuffles either join input — the
    co-location verifier."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    join_pos = min(
        (plan.find(t) for t in ("SortMergeJoin", "ShuffledHashJoin") if t in plan),
        default=-1,
    )
    if join_pos < 0:
        raise AssertionError(f"no join in plan:\n{plan}")
    below = plan[join_pos:]
    if "Exchange" in below:
        raise AssertionError(f"join inputs are shuffled:\n{plan}")
