"""Sessionization + funnel: brute-force equivalence, determinism under
repartitioning, threshold edge semantics, funnel ordering strictness."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import sessions

T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(seconds=s), u, ty, float(i))
            for i, (u, s, ty) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def _brute_sessions(rows, gap_s):
    """Serial per-user fold over (user, ts, event_id)-sorted events →
    {event_id: session_seq}."""
    out = {}
    by_user = {}
    for i, (u, s, ty) in enumerate(rows):
        by_user.setdefault(u, []).append((s, i))
    for u, evs in by_user.items():
        evs.sort()
        seq = 0
        prev = None
        for s, i in evs:
            if prev is None or s - prev > gap_s:
                seq += 1
            out[i] = seq
            prev = s
    return out


ROWS = [
    # user 1: three events inside one session, then a gap
    (1, 0, "view"), (1, 100, "click"), (1, 200, "purchase"), (1, 5000, "view"),
    # user 2: exactly-at-threshold gap continues the session
    (2, 0, "view"), (2, 1800, "click"), (2, 3601, "purchase"),
    # user 3: single event
    (3, 42, "error"),
    # user 4: tie timestamps (event_id breaks the tie)
    (4, 10, "view"), (4, 10, "click"), (4, 2000, "purchase"),
]


def test_sessionize_matches_serial_fold(spark):
    df = sessions.sessionize(_ev(spark, ROWS), gap_seconds=1800.0)
    got = {r["event_id"]: r["session_seq"] for r in df.collect()}
    assert got == _brute_sessions(ROWS, 1800)


def test_sessionize_threshold_edge(spark):
    """gap == threshold continues the session; gap just above splits."""
    df = sessions.sessionize(_ev(spark, ROWS), gap_seconds=1800.0)
    u2 = {
        r["event_id"]: r["session_seq"]
        for r in df.filter(F.col("user_id") == 2).collect()
    }
    # events 4,5 are 1800s apart (== gap: same session); 5→6 is 1801s (new)
    assert u2[4] == u2[5] == 1
    assert u2[6] == 2


def test_sessionize_partition_invariant(spark):
    base = _ev(spark, ROWS)
    a = sessions.sessionize(base.repartition(1), gap_seconds=1800.0)
    b = sessions.sessionize(base.repartition(7, "event_type"), gap_seconds=1800.0)
    rows_a = sorted(map(tuple, a.select("event_id", "session_seq").collect()))
    rows_b = sorted(map(tuple, b.select("event_id", "session_seq").collect()))
    assert rows_a == rows_b


def test_session_stats(spark):
    st = sessions.session_stats(
        sessions.sessionize(_ev(spark, ROWS), gap_seconds=1800.0)
    )
    got = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["duration_s"])
        for r in st.collect()
    }
    assert got[(1, 1)] == (3, 200.0)
    assert got[(1, 2)] == (1, 0.0)
    assert got[(2, 1)] == (2, 1800.0)
    assert got[(3, 1)] == (1, 0.0)
    # user 4: the 10s→2000s gap (1990s) exceeds the 1800s threshold
    assert got[(4, 1)] == (2, 0.0)
    assert got[(4, 2)] == (1, 0.0)


def test_funnel_strict_ordering(spark):
    """A user whose purchase PRECEDES their first view must not count at
    the purchase step."""
    rows = [
        (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),   # full path
        (2, 0, "purchase"), (2, 10, "view"), (2, 20, "click"),   # wrong order
        (3, 0, "view"),                                          # stops at 1
    ]
    fc = sessions.funnel_counts(_ev(spark, rows), ["view", "click", "purchase"])
    got = {r["step"]: r["users_reached"] for r in fc.collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_equal_ts_counts(spark):
    """Same-microsecond step-2 event qualifies (>= semantics)."""
    rows = [(1, 0, "view"), (1, 0, "click")]
    fc = sessions.funnel_counts(_ev(spark, rows), ["view", "click"])
    got = {r["step"]: r["users_reached"] for r in fc.collect()}
    assert got == {"view": 1, "click": 1}


def test_funnel_counts_non_increasing(spark):
    fc = sessions.funnel_counts(
        _ev(spark, ROWS), ["view", "click", "purchase"]
    ).orderBy("step_no")
    ns = [r["users_reached"] for r in fc.collect()]
    assert ns == sorted(ns, reverse=True)
