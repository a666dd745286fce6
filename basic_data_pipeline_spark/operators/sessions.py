"""Batch sessionization and funnel analysis over event streams.

The reference pipeline lands raw CDC events and leaves analysis to the
warehouse (reference: consumer_to_file.py writes rows; no analytics). A
training-data / product-analytics engine needs the two classic
event-sequence operators directly:

- gap-based sessionization: split each user's event stream into sessions
  wherever the inter-event gap exceeds a threshold (the batch analogue of
  streaming/windows.py's session windows — identical semantics on a
  bounded input, but computed as a window cumsum instead of state-store
  merges);
- ordered funnels: how many users reach step 1, then step 2 AFTER their
  first step-1 event, then step 3 after that — the strict-ordering
  semantics product funnels mean (not "did all three ever happen").

Scale design (100 TB):
- ``sessionize`` is ONE hash shuffle on the user key; both window passes
  (lag, running sum) share the partitioning so Catalyst plans a single
  Exchange. Per-user work is linear and streams through the sort buffer.
  A whale user's whole history does land in one task — the mitigation at
  extreme skew is pre-splitting by coarse time range (sessions cannot
  cross a split if the split gap exceeds the session gap), which
  preserves exactness because gap sessions are local to consecutive
  events.
- ``funnel_counts`` is one keyed aggregation per step (k is small and
  fixed); each intermediate is one row per surviving user, so the
  per-step join side shrinks monotonically and is broadcast-eligible
  long before the last step.
- Timestamps compare in integer MICROSECONDS (``unix_micros``) — no
  float rounding, so the same tie/threshold decisions replay bit-equal
  in any engine (the oracle states the same arithmetic in DuckDB's
  ``epoch_us``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    order_cols: Sequence[str] = ("event_id",),
    out_col: str = "session_seq",
) -> DataFrame:
    """Assign a per-user session ordinal (1-based) using a gap rule.

    A new session starts at the user's first event and at every event
    whose gap since the previous event is STRICTLY greater than
    ``gap_seconds`` (an event landing exactly at the threshold continues
    the session — matching streaming session-window merge semantics).
    ``order_cols`` break timestamp ties deterministically so replays and
    repartitioning cannot flip session boundaries.
    """
    order = [F.col(ts_col).asc(), *(F.col(c).asc() for c in order_cols)]
    w = Window.partitionBy(user_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap_us = int(round(gap_seconds * 1_000_000))
    prev = F.lag(us).over(w)
    is_new = (prev.isNull() | ((us - prev) > F.lit(gap_us))).cast("int")
    return (
        df.withColumn("_is_new", is_new)
        .withColumn(
            out_col,
            F.sum("_is_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .drop("_is_new")
    )


def session_stats(
    sessions: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    session_col: str = "session_seq",
    value_col: str | None = "value",
) -> DataFrame:
    """Per-session aggregates: event count, duration (seconds, exact
    micros arithmetic), and optional value sum. One keyed aggregation —
    at scale it reuses ``sessionize``'s user-hash partitioning, so AQE
    plans no extra exchange for the (user, session) grouping."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        ((F.max(us) - F.min(us)) / F.lit(1_000_000.0)).alias("duration_s"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    return sessions.groupBy(user_col, session_col).agg(*aggs)


def funnel_counts(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict-order funnel: for each step i, count users whose FIRST
    qualifying step-i event occurs at-or-after their first qualifying
    step-(i-1) event. Returns one row per step:
    ``(step_no, step, users_reached)`` — counts are non-increasing.

    Equal timestamps qualify (>=): a step landing in the same microsecond
    as its predecessor counts as ordered, which keeps the rule total and
    engine-independent (integer micros, no float comparison).
    """
    if not steps:
        raise ValueError("funnel_counts requires at least one step")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    d = df.select(
        F.col(user_col).alias("_u"), F.col(type_col).alias("_ty"), us.alias("_us")
    )
    reached: DataFrame | None = None
    out: DataFrame | None = None
    for i, step in enumerate(steps):
        f = d.filter(F.col("_ty") == F.lit(step))
        if reached is not None:
            f = f.join(reached, "_u").filter(F.col("_us") >= F.col("_t_prev"))
        reached = f.groupBy("_u").agg(F.min("_us").alias("_t_prev"))
        row = reached.agg(F.count(F.lit(1)).alias("users_reached")).select(
            F.lit(i + 1).alias("step_no"),
            F.lit(step).alias("step"),
            "users_reached",
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None
    return out
