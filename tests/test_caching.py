"""Checkpoint lifecycle helpers (caching.py): DataFrame.unpersist is a
NO-OP for localCheckpoint storage (the motivating bug — blocks
accumulate across BPE/GD iterations), while free_local_checkpoint
actually releases the blocks via the persistent-RDD registry.

Assertions are SET-DIFF based, never total-count based: earlier tests in
a full-suite run leak checkpoint blocks that the JVM garbage-collects at
its own pace, so a total census taken twice can shrink between the two
reads for reasons unrelated to the frame under test (observed r11: a
before-count of 11 dropped to 3 mid-test). Diffing the cached-RDD id
sets pins exactly the blocks THIS test created — those can't be GC'd
while the frame is referenced — and ignores concurrent reclamation of
strangers' blocks.
"""

from __future__ import annotations

from basic_data_pipeline_spark.caching import (
    free_local_checkpoint,
    tracked_local_checkpoint,
)


def _cached_ids(spark) -> set[int]:
    return {
        info.id()
        for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }


def test_plain_unpersist_is_noop_for_checkpoints(spark):
    before = _cached_ids(spark)
    df = spark.range(50_000).selectExpr("id", "id * 2 AS x").localCheckpoint(
        eager=True
    )
    new = _cached_ids(spark) - before
    assert len(new) == 1
    df.unpersist(blocking=True)
    # the documented trap: nothing was freed
    assert new <= _cached_ids(spark)
    free_local_checkpoint(df)  # untracked frame: no ids — safe no-op
    assert new <= _cached_ids(spark)


def test_tracked_checkpoint_frees_for_real(spark):
    before = _cached_ids(spark)
    df = tracked_local_checkpoint(
        spark.range(50_000).selectExpr("id", "id * 3 AS x")
    )
    assert df.count() == 50_000
    new = _cached_ids(spark) - before
    assert len(new) == 1
    free_local_checkpoint(df)
    assert not (new & _cached_ids(spark))
    # double-free is harmless
    free_local_checkpoint(df)
    assert not (new & _cached_ids(spark))


def test_iteration_storage_stays_bounded(spark):
    """The BPE/GD loop shape: N rounds of checkpoint-and-release hold at
    most one round's blocks."""
    before = _cached_ids(spark)
    prev = tracked_local_checkpoint(spark.range(10_000))
    for i in range(4):
        cur = tracked_local_checkpoint(
            prev.selectExpr(f"id + {i} AS id")
        )
        free_local_checkpoint(prev)
        prev = cur
        mine = _cached_ids(spark) - before
        assert len(mine) == 1
    free_local_checkpoint(prev)
    assert not ((_cached_ids(spark) - before))
