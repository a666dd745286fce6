"""Fixture-table catalog: parquet scans + temp-view registration.

The reference auto-discovers its table namespace from Kafka topic names
(/root/reference/consumer_to_file.py:171-180); our batch analytics surface
discovers it from the fixture directory. Scans are plain
``spark.read.parquet`` so Catalyst gets predicate pushdown, column pruning
and (on partitioned layouts) partition pruning for free — a scan that reads
all columns for a 2-column projection is a bug, and `.explain` on any query
in queries.py should show `PushedFilters`/`ReadSchema` trimmed accordingly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The driver's fixture namespace (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimensions small enough to broadcast at ANY scale factor (region/nation are
# fixed-cardinality in TPC-H-style schemas; supplier stays < broadcast
# threshold through sf100).
BROADCASTABLE: frozenset[str] = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Column pruning/pushdown happen in Catalyst.

    ``events.ts`` has been written by the driver in two physical forms so
    far, so we normalize BOTH at this one boundary:

    * parquet TIMESTAMP(NANOS) — Spark's vectorized reader rejects it
      outright (PARQUET_TYPE_ILLEGAL); we read nanos as long (legacy conf)
      and convert to a microsecond timestamp in the plan.
    * parquet TIMESTAMP(MICROS) with no timezone — loads as
      ``TIMESTAMP_NTZ``, which Spark 4 refuses to ``cast("long")`` or feed
      to ``unix_millis``; we cast NTZ→LTZ, value-preserving under the
      pinned UTC session timezone (session.py).

    Both branches are zero-shuffle projections inside whole-stage codegen;
    the DuckDB oracle applies the matching CAST(ts AS TIMESTAMP).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # The driver runs queries on a VANILLA session (not session.get_spark),
    # so scale-critical runtime confs also land here, the one boundary
    # every query passes through: bound plan-string renders (see
    # session.py — AQE renders an explain per plan update, and large
    # plan literals like the Bloom prefilter words make the default
    # ~2 GB cap super-linear or heap-fatal).
    spark.conf.set("spark.sql.maxPlanStringLength", str(1024 * 1024))
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL surface."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
