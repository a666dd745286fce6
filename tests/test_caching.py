"""Checkpoint lifecycle helpers (caching.py): DataFrame.unpersist is a
NO-OP for localCheckpoint storage (the motivating bug — blocks
accumulate across BPE/GD iterations), while free_local_checkpoint
actually releases the blocks via the persistent-RDD registry."""

from __future__ import annotations

from basic_data_pipeline_spark.caching import (
    free_local_checkpoint,
    tracked_local_checkpoint,
)


def _n_cached(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_plain_unpersist_is_noop_for_checkpoints(spark):
    before = _n_cached(spark)
    df = spark.range(50_000).selectExpr("id", "id * 2 AS x").localCheckpoint(
        eager=True
    )
    assert _n_cached(spark) == before + 1
    df.unpersist(blocking=True)
    # the documented trap: nothing was freed
    assert _n_cached(spark) == before + 1
    free_local_checkpoint(df)  # untracked frame: no ids — safe no-op
    assert _n_cached(spark) == before + 1


def test_tracked_checkpoint_frees_for_real(spark):
    before = _n_cached(spark)
    df = tracked_local_checkpoint(
        spark.range(50_000).selectExpr("id", "id * 3 AS x")
    )
    assert df.count() == 50_000
    assert _n_cached(spark) == before + 1
    free_local_checkpoint(df)
    assert _n_cached(spark) == before
    # double-free is harmless
    free_local_checkpoint(df)
    assert _n_cached(spark) == before


def test_iteration_storage_stays_bounded(spark):
    """The BPE/GD loop shape: N rounds of checkpoint-and-release hold at
    most one round's blocks."""
    before = _n_cached(spark)
    prev = tracked_local_checkpoint(spark.range(10_000))
    for i in range(4):
        cur = tracked_local_checkpoint(
            prev.selectExpr(f"id + {i} AS id")
        )
        free_local_checkpoint(prev)
        prev = cur
        assert _n_cached(spark) == before + 1
    free_local_checkpoint(prev)
    assert _n_cached(spark) == before
