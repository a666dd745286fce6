"""Streaming data-quality monitor: per-micro-batch expectation checks
appended to an idempotent metrics log.

The streaming face of operators/quality.py — every micro-batch runs the
SAME single-aggregation ``check_constraints`` the batch pipeline uses,
and the verdict rows land in a partitioned parquet log keyed by epoch:

* each epoch's verdicts are written to their own ``epoch=N`` partition
  with overwrite — a replayed batch rewrites an identical partition
  instead of appending duplicates (the epoch-subdir idempotence pattern
  of streaming/dedup_stream.py), so the log is exactly-once without any
  swap machinery: partitions are independent, there is nothing to merge;
* the log is the monitoring TABLE: per-check pass fractions over epochs
  are one groupBy away, and drift in a pass rate is visible as data —
  the same philosophy as the batch side (a failed check is data, not an
  exception);
* ``fail_fast`` turns the monitor into a circuit breaker: any failing
  check raises ``QualityGateError`` AFTER the verdicts are persisted, so
  the streaming query stops with the evidence already on disk — at scale
  you stop a poisoned upstream before it pollutes a 100 TB sink.

State is O(checks) per batch — the aggregation is map-side combined and
the log grows by #checks rows per epoch, never with event volume.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators.quality import (
    Check,
    check_constraints,
)


class QualityGateError(RuntimeError):
    """Raised by fail_fast monitors when a batch fails an expectation."""


def make_quality_batch_fn(
    log_path: str,
    checks: list[Check],
    fail_fast: bool = False,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: evaluate ``checks`` against the micro-batch and
    persist one verdict row per check under ``epoch=<id>``."""

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        verdicts = check_constraints(batch_df, checks)
        (
            verdicts.coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(log_path, f"epoch={epoch_id}"))
        )
        if fail_fast:
            failed = [
                r["check"]
                for r in verdicts.filter(~F.col("passed")).collect()
            ]
            if failed:
                raise QualityGateError(
                    f"epoch {epoch_id} failed checks: {', '.join(failed)}"
                )

    return fn


def read_quality_log(spark: SparkSession, log_path: str) -> DataFrame:
    """The monitoring table: (check, n_rows, n_pass, pass_fraction,
    passed, epoch) across all recorded epochs."""
    return spark.read.option("basePath", log_path).parquet(
        os.path.join(log_path, "epoch=*")
    )


def quality_files(
    spark: SparkSession,
    source_dir: str,
    log_path: str,
    checkpoint: str,
    schema: str,
    checks: list[Check],
    **kw,
):
    """Drive the monitor through the real streaming engine off a file
    source (the in-container stand-in for Kafka); availableNow drains
    what exists and stops."""
    fn = make_quality_batch_fn(log_path, checks, **kw)
    raw = spark.readStream.schema(schema).json(source_dir)
    return (
        raw.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
