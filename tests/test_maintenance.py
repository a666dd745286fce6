"""File-compaction maintenance + as-of operator edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from basic_data_pipeline_spark.catalog import load_table
from basic_data_pipeline_spark.operators import maintenance
from basic_data_pipeline_spark.operators.asof import asof_join

SF = "/root/testdata/sf0.001"


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    events = load_table(spark, SF, "events")
    path = str(tmp_path / "frag")
    # simulate a micro-batch-fragmented sink: 32 small files
    events.repartition(32).write.parquet(path)
    before = maintenance.parquet_layout(path)
    assert before["n_files"] >= 32

    orig = events.count()
    after = maintenance.compact_parquet(
        spark, path, target_file_bytes=10 * 1024 * 1024, sort_cols=["event_id"]
    )
    assert after["n_files"] < before["n_files"]
    assert after["n_files"] >= 1
    assert spark.read.parquet(path).count() == orig


def test_asof_join_no_match_is_null(spark):
    left = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 100.0), (2, 5, 100.0)],
        "key long, ts long, x double",
    ).select("key", "ts", "x")
    right = spark.createDataFrame(
        [(1, 15, 7.0)], "key long, ts long, v double"
    )
    out = {
        (r["key"], r["ts"]): r["v_asof"]
        for r in asof_join(left, right, "key", "ts", ["v"]).collect()
    }
    assert out[(1, 10)] is None       # right row is later
    assert out[(1, 20)] == 7.0        # most recent at-or-before
    assert out[(2, 5)] is None        # key never matched


def test_asof_join_tie_takes_right_row(spark):
    left = spark.createDataFrame([(1, 10)], "key long, ts long")
    right = spark.createDataFrame([(1, 10, 42.0)], "key long, ts long, v double")
    row = asof_join(left, right, "key", "ts", ["v"]).collect()[0]
    assert row["v_asof"] == 42.0


def test_asof_join_rejects_collisions(spark):
    left = spark.createDataFrame([(1, 10, 1.0)], "key long, ts long, v double")
    right = spark.createDataFrame([(1, 10, 2.0)], "key long, ts long, v double")
    try:
        asof_join(left, right, "key", "ts", ["v"])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_asof_join_matched_null_value_stays_null(spark):
    """A matched right row whose value is NULL must yield NULL — not skip
    back to a stale earlier value (the struct-carry fix)."""
    left = spark.createDataFrame([(1, 6), (1, 3)], "key long, ts long")
    right = spark.createDataFrame(
        [(1, 2, 5.0), (1, 5, None)], "key long, ts long, v double"
    )
    out = {r["ts"]: r["v_asof"] for r in asof_join(left, right, "key", "ts", ["v"]).collect()}
    assert out[3] == 5.0      # before the null row: carries ts=2's value
    assert out[6] is None     # matched ts=5 whose v IS null
