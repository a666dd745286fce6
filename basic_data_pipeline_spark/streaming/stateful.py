"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.9 — the reference's only cross-batch state is a
`created_tables` set, consumer_to_file.py:58; these supply the per-KEY
arbitrary state Spark reserves for applyInPandasWithState).

Two canonical shapes:
- `running_user_stats`: unbounded per-key accumulator, update mode —
  every micro-batch emits the refreshed running totals for keys it
  touched (a streaming upsert feed for a serving store).
- `sessionize_with_state`: event-time session builder with an explicit
  gap timeout — state holds the open session; the WATERMARK closes it
  (append mode emits only finalized sessions). This is the custom-logic
  generalization of `F.session_window` for when the session payload isn't
  expressible as built-in aggregates.

Scale notes: state lives in the state store partitioned by the grouping
key (one shuffle); size is O(active keys), not O(events). Arrow moves
each key-group batch into pandas — the only Python in the path, and the
part that must stay per-GROUP vectorized, never per-row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_RUNNING_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
)


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) across ALL batches — update mode.
    events: (user_id long, value double, ...)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        RUNNING_STATS_SCHEMA,
        _RUNNING_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_with_state(events: DataFrame, gap_ms: int = 30 * 60 * 1000) -> DataFrame:
    """Event-time sessions with custom state: a session closes `gap_ms`
    after its last event, enforced via event-time timeout against the
    watermark. Input must carry withWatermark('ts', ...). Emits ONLY
    finalized sessions (append semantics) — the property F.session_window
    can't give you when the session record needs custom fields."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_ms, end_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                    "n_events": [n],
                }
            )
            return

        start_ms, end_ms, n = state.get if state.exists else (None, None, 0)
        closed = []
        # concatenate BEFORE sorting: per-chunk sorting would re-introduce
        # out-of-order ts across chunk boundaries of a large group
        all_ts = sorted(
            int(t)
            for pdf in pdfs
            for t in (pdf["ts"].astype("int64") // 1_000_000)
        )
        for t in all_ts:
            if start_ms is None:
                start_ms, end_ms, n = t, t, 1
            elif start_ms - gap_ms <= t <= end_ms + gap_ms:
                # within the session's reach on either side — late events
                # inside the watermark may EXTEND the start backwards
                start_ms = min(start_ms, t)
                end_ms, n = max(end_ms, t), n + 1
            elif t > end_ms + gap_ms:
                closed.append((key[0], start_ms, end_ms, n))
                start_ms, end_ms, n = t, t, 1
            else:
                # more than gap BEFORE the open session: an out-of-order
                # singleton older than anything that can still merge with
                # it (this batch is sorted; prior sessions are closed) —
                # emit it as its own closed session
                closed.append((key[0], t, t, 1))
        # If the watermark already passed this session's close time (late
        # batch ordering), finalize now — a timeout below the watermark is
        # invalid and would never fire anyway.
        wm = state.getCurrentWatermarkMs()
        if end_ms is not None and end_ms + gap_ms <= wm:
            closed.append((key[0], start_ms, end_ms, n))
            state.remove()
        else:
            state.update((start_ms, end_ms, n))
            state.setTimeoutTimestamp(end_ms + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="ms") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="ms") for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_SCHEMA,
        _SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
