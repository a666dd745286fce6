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


# --------------------------------------------------------------------------
# r10: batch-side writer guard (verdict item #2) + steal/renew atomicity
# --------------------------------------------------------------------------


def test_writer_lease_blocks_while_stream_holds(tmp_path):
    """The headline interleaving case: a guarded stream factory holds the
    index lease; a batch mutation launched meanwhile (compaction, append)
    must raise WriterLeaseHeld — even same-process — instead of
    interleaving with the stream's append+ledger protocol."""
    p = str(tmp_path / "idx")
    token = SW.acquire_lease(p, owner="guarded-stream:test")
    with pytest.raises(SW.WriterLeaseHeld):
        with SW.writer_lease(p, owner="batch:compact"):
            pass
    SW.release_lease(p, token)
    with SW.writer_lease(p, owner="batch:compact") as t2:
        assert t2
    assert not os.path.exists(SW.lease_path(p))


def test_writer_lease_reentrant_within_chain(tmp_path):
    """A guarded stream's body invokes wrapped batch operators on its own
    index: under reentrant_scope the nested writer_lease passes through;
    outside it, it blocks."""
    p = str(tmp_path / "idx")
    token = SW.acquire_lease(p)
    with SW.reentrant_scope(p, token):
        with SW.writer_lease(p, owner="batch:nested") as t:
            assert t == token  # pass-through, no second acquisition
        # still held by the stream afterwards (pass-through released nothing)
        assert json.load(open(SW.lease_path(p)))["token"] == token
    with pytest.raises(SW.WriterLeaseHeld):
        with SW.writer_lease(p, owner="batch:outside"):
            pass
    SW.release_lease(p, token)


def test_reentrant_chain_detects_lost_lease(tmp_path):
    """If the enclosing writer's lease vanished or was stolen, the nested
    guard fails loudly instead of silently writing unleased."""
    p = str(tmp_path / "idx")
    token = SW.acquire_lease(p)
    with SW.reentrant_scope(p, token):
        SW.release_lease(p, token, force=True)
        with pytest.raises(SW.WriterLeaseHeld):
            with SW.writer_lease(p):
                pass


def test_stale_steal_is_atomic_under_racers(tmp_path):
    """Many threads that all judged the same lease stale race to steal
    it. The PROTOCOL's guarantee (acquire_lease's displaced-fresh-lease
    recovery — rename-aside, verify, put-back — has a documented window
    where a third racer links while the path is transiently empty, so a
    legitimate holder CAN be displaced) is not file-token stability; it
    is that at most one writer KEEPS PROCEEDING: a displaced holder's
    next renew fail-stops on the token re-verify, or — when the path is
    momentarily unclaimed — legitimately re-claims it under its own
    token. Checked per successful acquirer, serialized: after a renew
    attempt, either WriterLeaseHeld was raised (fail-stop) or the file
    carries OUR token (we hold / re-claimed) — never a silent
    proceed-while-foreign-token state. (The r10 form asserted the
    stronger file-token-stability invariant and flaked under full-suite
    scheduling load — r11.)"""
    import threading

    p = str(tmp_path / "idx")
    lp = SW.lease_path(p)
    stale = SW._lease_payload(0.0, "crashed")  # ttl 0 → instantly stale
    stale["pid"] = 99999999  # and a dead pid
    with open(lp, "w") as f:
        json.dump(stale, f)

    outcomes = []
    lock = threading.Lock()

    def racer():
        try:
            t = SW.acquire_lease(p, takeover_same_process=False)
        except SW.WriterLeaseHeld:
            return
        with lock:
            try:
                SW.renew_lease(p, t)
            except SW.WriterLeaseHeld:
                outcomes.append("fail_stopped")  # displaced → loud stop
            else:
                cur = SW._read_lease(lp)
                assert cur is not None and cur.get("token") == t, (
                    "renew proceeded while the lease carries a foreign "
                    "token — silent dual-writer"
                )
                outcomes.append("held")
                SW.release_lease(p, t)

    threads = [threading.Thread(target=racer) for _ in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert outcomes, "nobody stole the stale lease"
    assert "held" in outcomes  # someone genuinely proceeded


def test_renew_reverifies_after_replace(tmp_path):
    """A renew that lands after a takeover must not silently resurrect
    the old writer: the re-verify raises for the superseded token."""
    p = str(tmp_path / "idx")
    t1 = SW.acquire_lease(p)
    t2 = SW.acquire_lease(p)  # same-process takeover
    with pytest.raises(SW.WriterLeaseHeld):
        SW.renew_lease(p, t1)
    SW.renew_lease(p, t2)
    SW.release_lease(p, t2)


def test_batch_mutators_are_leased_end_to_end(spark, tmp_path):
    """incremental.build_index / incremental_dedup / compact_index all
    acquire and release the writer lease; a live foreign holder blocks
    each of them."""
    from basic_data_pipeline_spark.operators import incremental as inc

    docs = spark.createDataFrame(
        [(i, f"doc number {i} with some shared shingle text") for i in range(30)],
        "doc_id long, text string",
    )
    p = str(tmp_path / "idx")
    inc.build_index(spark, docs, p)
    assert not os.path.exists(SW.lease_path(p))  # released after build

    # simulate a LIVE foreign-process holder
    import subprocess
    import sys as _sys

    helper = subprocess.Popen([_sys.executable, "-c", "import time; time.sleep(60)"])
    try:
        token = SW.acquire_lease(p)
        lp = SW.lease_path(p)
        cur = json.load(open(lp))
        cur["pid"] = helper.pid
        cur["token"] = "foreign"
        with open(lp, "w") as f:
            json.dump(cur, f)
        batch = spark.createDataFrame(
            [(100, "a fresh doc")], "doc_id long, text string"
        )
        with pytest.raises(SW.WriterLeaseHeld):
            inc.incremental_dedup(spark, batch, p)
        with pytest.raises(SW.WriterLeaseHeld):
            inc.compact_index(spark, p)
    finally:
        helper.kill()
    SW.release_lease(p, None, force=True)
    # unblocked: both run
    batch = spark.createDataFrame(
        [(101, "another fresh doc")], "doc_id long, text string"
    )
    inc.incremental_dedup(spark, batch, p)
    inc.compact_index(spark, p)
    assert not os.path.exists(SW.lease_path(p))


def test_guarded_stream_release_hook(spark, tmp_path):
    """A cleanly stopped stream releases its lease via the attached hook
    instead of blocking a replacement writer for the remaining ttl."""
    from basic_data_pipeline_spark.streaming import dedup_stream as DS

    p = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    docs = spark.createDataFrame(
        [(1, "first document text here")], "doc_id long, text string"
    )
    from basic_data_pipeline_spark.operators import incremental as inc

    inc.build_index(spark, docs, p)
    fn = DS.make_dedup_batch_fn(p, out)
    assert os.path.exists(SW.lease_path(p))
    b = spark.createDataFrame([(2, "second doc")], "doc_id long, text string")
    fn(b, 0)
    SW.release_writer(fn)
    assert not os.path.exists(SW.lease_path(p))
    SW.release_writer(fn)  # idempotent
    # a replacement writer acquires immediately
    fn2 = DS.make_dedup_batch_fn(p, out)
    SW.release_writer(fn2)


def test_writer_lease_creates_missing_parent_dir(tmp_path):
    """A guarded writer may be the one CREATING the target (a CDC sink's
    first overwrite into a fresh directory tree): taking the lease must
    not require the parent to exist (full-suite r10 finding — the
    streaming CDC ingest died opening the lease temp file)."""
    p = str(tmp_path / "not" / "yet" / "created" / "table")
    with SW.writer_lease(p, owner="batch:first-write") as t:
        assert t
    assert not os.path.exists(SW.lease_path(p))


# --------------------------------------------------------------------------
# r11: rebuild takeover discipline (r10 ADVICE) — a rebuild takes over
# crashed writers but never evicts a LIVE concurrent rebuild (rebuild
# helpers don't renew, so the renew-time re-verify backstop can't save
# them; two interleaved rebuilds would corrupt silently).
# --------------------------------------------------------------------------


def _tiny_index(spark, tmp_path):
    from basic_data_pipeline_spark.operators import incremental as inc

    idx = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(i, f"base doc number {i} with words") for i in range(8)],
        "doc_id long, text string",
    )
    inc.build_index(spark, docs, idx)
    return idx


def test_rebuild_blocks_on_live_rebuild_lease(spark, tmp_path):
    """A live lease owned by another rebuild (live pid) must make a second
    rebuild raise WriterLeaseHeld instead of force-releasing it."""
    import subprocess
    import sys as _sys

    from basic_data_pipeline_spark.streaming import rebuild as RB

    idx = _tiny_index(spark, tmp_path)
    helper = subprocess.Popen(
        [_sys.executable, "-c", "import time; time.sleep(60)"]
    )
    try:
        SW.acquire_lease(idx, owner="rebuild:rebuild_dedup_index")
        lp = SW.lease_path(idx)
        cur = json.load(open(lp))
        cur["pid"] = helper.pid  # live, other process
        cur["token"] = "other-rebuild"
        with open(lp, "w") as f:
            json.dump(cur, f)
        with pytest.raises(SW.WriterLeaseHeld):
            RB.rebuild_dedup_index(spark, idx)
        assert os.path.exists(lp)  # the live rebuild's lease survived
    finally:
        helper.kill()
        helper.wait()
        SW.release_lease(idx, force=True)


def test_rebuild_blocks_on_live_foreign_writer(spark, tmp_path):
    """A live lease held by another PROCESS (stream or batch) is never
    stolen by a rebuild — operators verify the holder is gone and
    release_lease(force=True) themselves (the r10 guard force-released
    unconditionally)."""
    import subprocess
    import sys as _sys

    from basic_data_pipeline_spark.streaming import rebuild as RB

    idx = _tiny_index(spark, tmp_path)
    helper = subprocess.Popen(
        [_sys.executable, "-c", "import time; time.sleep(60)"]
    )
    try:
        SW.acquire_lease(idx, owner="guarded-stream:dedup")
        lp = SW.lease_path(idx)
        cur = json.load(open(lp))
        cur["pid"] = helper.pid
        cur["token"] = "live-foreign-stream"
        with open(lp, "w") as f:
            json.dump(cur, f)
        with pytest.raises(SW.WriterLeaseHeld):
            RB.rebuild_dedup_index(spark, idx)
    finally:
        helper.kill()
        helper.wait()
        SW.release_lease(idx, force=True)


def test_rebuild_blocks_second_in_process_rebuild(spark, tmp_path):
    """Two rebuilds racing in ONE process serialize on the per-path mutex:
    the second fails loudly while the first's lock is held."""
    import os as _os

    from basic_data_pipeline_spark.streaming import rebuild as RB

    idx = _tiny_index(spark, tmp_path)
    key = _os.path.abspath(idx)
    import threading as _threading

    with RB._REBUILD_LOCKS_GUARD:
        lock = RB._REBUILD_LOCKS.setdefault(key, _threading.Lock())
    assert lock.acquire(blocking=False)
    try:
        with pytest.raises(SW.WriterLeaseHeld):
            RB.rebuild_dedup_index(spark, idx)
    finally:
        lock.release()
    # with the mutex free, the rebuild proceeds (takes over nothing —
    # no lease exists — and leaves the lease released)
    RB.rebuild_dedup_index(spark, idx)
    assert not os.path.exists(SW.lease_path(idx))


def test_rebuild_takes_over_crashed_same_process_stream(spark, tmp_path):
    """The DirtyIndexError recovery flow: a stream that crashed in THIS
    still-live process left its lease (live pid — _is_stale can't clear
    it); the rebuild takes it over atomically and releases on exit."""
    from basic_data_pipeline_spark.streaming import rebuild as RB

    idx = _tiny_index(spark, tmp_path)
    SW.acquire_lease(idx, owner="guarded-stream:crashed")
    RB.rebuild_dedup_index(spark, idx)
    assert not os.path.exists(SW.lease_path(idx))
