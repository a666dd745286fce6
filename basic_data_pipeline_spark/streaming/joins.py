"""Stream-stream and stream-static joins with watermark-bounded state.

The reference joins nothing (one topic → one table); these are the join
surfaces a streaming consumer of its data would need next. The rules that
make them run forever on unbounded sources:

- **stream-static**: the static side is re-read per micro-batch (or
  broadcast); no state at all. Enrichment joins (events × dimension)
  belong here, never in a stream-stream join.
- **stream-stream**: BOTH sides must carry a watermark and the join
  condition must bound event-time skew (a time-range predicate), so the
  engine can evict buffered rows older than
  watermark - max_skew. Without the range condition the state grows
  without bound — Spark would buffer both streams forever.

Each builder works on batch DataFrames too (the condition is
engine-agnostic), which is how the oracle-style tests pin the semantics
before the streaming tests run the same plan under readStream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static enrichment join: the dimension broadcasts per
    micro-batch; zero streaming state, no watermark needed."""
    return events.join(F.broadcast(dim), on=on, how="left")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_skew: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join on `key` where the right event happened
    within [left_ts - max_skew, left_ts]. Both sides get a `watermark`
    watermark; with the time-range bound the engine keeps at most
    (watermark + max_skew) of either stream buffered per key — the state
    eviction contract that makes the join viable on unbounded input.

    Batch semantics are identical (watermarks are no-ops in batch), so
    the same builder is testable against a plain range-join oracle."""
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {max_skew}")
        )
    )
    return lw.join(rw, cond, "inner")


def dedup_within_watermark(
    events: DataFrame, keys: list[str], watermark: str = "1 hour", ts: str = "ts"
) -> DataFrame:
    """Streaming deduplication with bounded state:
    dropDuplicatesWithinWatermark keeps each key's fingerprint only until
    the watermark passes it, so state is (distinct keys per watermark
    window), not (all keys ever) — the streaming form of the CDC
    replay-dedup idea (streaming/ingest.py) for sources without offsets.
    Falls back to plain dropDuplicates on a batch DataFrame (where the
    watermark-scoped variant is not defined)."""
    if events.isStreaming:
        return events.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)
