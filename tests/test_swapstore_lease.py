"""Single-writer lease for swapstore/index directories (r8 verdict
item #6): two concurrent writers used to race the temp+rename swap and
the index append+ledger protocol SILENTLY — now the second writer
raises swapstore.WriterLeaseHeld loudly."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pytest

from basic_data_pipeline_spark.streaming import swapstore as SW


def test_acquire_then_second_acquire_same_process_takes_over(tmp_path):
    p = str(tmp_path / "idx")
    t1 = SW.acquire_lease(p)
    # same-process takeover is allowed (stream restart in a long-lived
    # driver); the superseded token's renew then fails loudly
    t2 = SW.acquire_lease(p)
    assert t1 != t2
    with pytest.raises(SW.WriterLeaseHeld):
        SW.renew_lease(p, t1)
    SW.renew_lease(p, t2)  # the live writer keeps working
    SW.release_lease(p, t2)
    assert not os.path.exists(SW.lease_path(p))


def test_foreign_live_holder_blocks(tmp_path):
    """A lease held by a LIVE pid of another process blocks acquisition
    (the cross-process double-launch)."""
    p = str(tmp_path / "idx")
    helper = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    try:
        t = SW.acquire_lease(p)
        lp = SW.lease_path(p)
        cur = json.load(open(lp))
        cur["pid"] = helper.pid  # a different, live process
        cur["token"] = "someone-else"
        with open(lp, "w") as f:
            json.dump(cur, f)
        with pytest.raises(SW.WriterLeaseHeld):
            SW.acquire_lease(p)
        # and our old token no longer renews (we were superseded)
        with pytest.raises(SW.WriterLeaseHeld):
            SW.renew_lease(p, t)
    finally:
        helper.kill()
        helper.wait()


def test_dead_pid_is_stolen(tmp_path):
    p = str(tmp_path / "idx")
    helper = subprocess.Popen([sys.executable, "-c", "pass"])
    helper.wait()  # now certainly dead
    SW.acquire_lease(p)
    lp = SW.lease_path(p)
    cur = json.load(open(lp))
    cur["pid"] = helper.pid
    cur["token"] = "dead-holder"
    with open(lp, "w") as f:
        json.dump(cur, f)
    t = SW.acquire_lease(p)  # steals without waiting for the ttl
    SW.renew_lease(p, t)


def test_expired_ttl_is_stolen(tmp_path):
    p = str(tmp_path / "idx")
    lp = SW.lease_path(p)
    with open(lp, "w") as f:
        json.dump(
            {
                "token": "stale", "host": "elsewhere", "pid": 1,
                "owner": "", "acquired": time.time() - 7200, "ttl": 1800,
            },
            f,
        )
    t = SW.acquire_lease(p)
    SW.renew_lease(p, t)


def test_force_release_clears_foreign_lease(tmp_path):
    p = str(tmp_path / "idx")
    SW.acquire_lease(p)
    SW.release_lease(p, token="wrong")  # token mismatch: no-op
    assert os.path.exists(SW.lease_path(p))
    SW.release_lease(p, force=True)
    assert not os.path.exists(SW.lease_path(p))


def test_two_guarded_stream_writers_exactly_one_proceeds(spark, tmp_path):
    """The real double-launch: two guarded-stream factories on ONE index
    dir. The second supersedes the first (same process); the first's
    next batch raises instead of silently racing the append."""
    from basic_data_pipeline_spark.operators import incremental as INC
    from basic_data_pipeline_spark.streaming import dedup_stream as DS

    idx = str(tmp_path / "idx")
    out_a = str(tmp_path / "out_a")
    out_b = str(tmp_path / "out_b")
    base = spark.createDataFrame(
        [(i, f"base doc number {i} with words") for i in range(8)],
        "doc_id long, text string",
    )
    INC.build_index(spark, base, idx)
    fn_a = DS.make_dedup_batch_fn(idx, out_a)
    batch1 = spark.createDataFrame(
        [(100, "fresh doc one hundred entirely new words")],
        "doc_id long, text string",
    )
    fn_a(batch1, 0)  # writer A works while alone
    fn_b = DS.make_dedup_batch_fn(idx, out_b)  # double-launch: takes over
    batch2 = spark.createDataFrame(
        [(101, "fresh doc one hundred one other words")],
        "doc_id long, text string",
    )
    with pytest.raises(SW.WriterLeaseHeld):
        fn_a(batch2, 1)  # superseded writer stops LOUDLY
    fn_b(batch2, 1)  # the new writer proceeds
    SW.release_lease(idx, force=True)


def test_rebuild_force_releases_lease(spark, tmp_path):
    """rebuild helpers assert the crashed writer is gone: they clear the
    lease so the restarted stream acquires immediately."""
    from basic_data_pipeline_spark.operators import incremental as INC
    from basic_data_pipeline_spark.streaming import dedup_stream as DS
    from basic_data_pipeline_spark.streaming import rebuild as RB

    idx = str(tmp_path / "idx")
    base = spark.createDataFrame(
        [(i, f"base doc number {i} with words") for i in range(8)],
        "doc_id long, text string",
    )
    INC.build_index(spark, base, idx)
    DS.make_dedup_batch_fn(idx, str(tmp_path / "out"))  # holds the lease
    assert os.path.exists(SW.lease_path(idx))
    RB.rebuild_dedup_index(spark, idx)
    assert not os.path.exists(SW.lease_path(idx))
    # restarted stream acquires with no ttl wait
    DS.make_dedup_batch_fn(idx, str(tmp_path / "out2"))
    SW.release_lease(idx, force=True)
