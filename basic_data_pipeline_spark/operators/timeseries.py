"""Time-series gap filling: bucket + dense grid + LOCF / linear
interpolation (the hypertable surface: TimescaleDB's
``time_bucket_gapfill`` + ``locf`` + ``interpolate``, re-expressed as
DataFrame plans).

The reference provisions an analytics environment over event streams
(/root/reference/spark.sh:17-27) but implements no time-series
operators; these make the `events` table a first-class series surface:
dashboards and downstream models need DENSE per-key series (one row per
time bucket, gaps filled by a declared rule), while the raw facts are
sparse and irregular.

Scale shape: the dense grid is keys × buckets — the OUTPUT's own size,
materialized by one `sequence` explode per key (no driver loop, no
cross join against a generated calendar table); bounds ride in a 1-row
broadcast so no driver round-trip fixes them; the fill rules are window
functions partitioned by key (ONE shuffle, which the grid join already
positioned). Per-key row count equals the bucket range — uniform by
construction, so the window stage cannot skew."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from basic_data_pipeline_spark.partitioning import spread

_METHODS = ("locf", "linear", "zero", "null")


def time_bucket(ts: Column, seconds: int) -> Column:
    """Epoch-floored bucket id (BIGINT seconds, a multiple of
    ``seconds``) — integer arithmetic, so every engine computes the
    identical bucket for the identical timestamp. Kept as seconds
    rather than a timestamp so bucket math (ranges, joins, interpolation
    distances) stays integer-exact and timezone-free."""
    s = F.unix_timestamp(ts)
    return (s - F.pmod(s, F.lit(seconds))).cast("long")


def gapfill(
    series: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    bucket_seconds: int,
    method: str = "locf",
    bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """(key, bucket, value, filled) — densify a (key, bucket, value)
    series to one row per key per bucket over [lo, hi] and fill the
    holes:

    * ``locf`` — last observation carried forward (leading holes stay
      null): ``last(value) IGNORE NULLS`` over the preceding frame.
    * ``linear`` — linear interpolation between the nearest observed
      neighbors; holes before the first / after the last observation
      stay null (the TimescaleDB ``interpolate`` contract).
    * ``zero`` / ``null`` — constant fill / leave holes explicit.

    ``bounds`` (lo, hi bucket ids, inclusive) pins the grid; when
    omitted the global min/max bucket of the input defines it, computed
    as a 1-row aggregate that joins back by broadcast (no driver
    fetch). ``filled`` marks synthesized rows.

    The input is the already-bucketed series (aggregate the raw facts
    with :func:`time_bucket` first — at 100 TB the series frame is
    keys × observed-buckets, orders of magnitude smaller than the raw
    events the aggregation reduced)."""
    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}")
    if bounds is not None:
        lo, hi = bounds
        if lo % bucket_seconds or hi % bucket_seconds:
            raise ValueError("bounds must be multiples of bucket_seconds")
        bdf = series.sparkSession.range(1).select(
            F.lit(int(lo)).alias("_lo"), F.lit(int(hi)).alias("_hi")
        )
    else:
        bdf = series.agg(
            F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
        )
    # spread the keys BEFORE the per-key sequence explode: the distinct
    # output is a byte-small frame AQE coalesces to ~1 partition, and
    # without the explicit fan-out the buckets-per-key row
    # multiplication (the whole grid) runs on one core (measured: 7x
    # wall at sf0.1 in the 16x probe before this line). The hash
    # partitioning by key also pre-positions the grid for the series
    # join and the fill windows — one exchange serves all three.
    grid = (
        spread(series.select(key_col).distinct(), key_col)
        .crossJoin(F.broadcast(bdf))
        .select(
            key_col,
            F.explode(
                F.sequence(
                    F.col("_lo"), F.col("_hi"), F.lit(int(bucket_seconds))
                )
            ).alias(bucket_col),
        )
    )
    s = series.select(
        key_col, bucket_col, F.col(value_col).alias("_obs")
    )
    j = grid.join(s, [key_col, bucket_col], "left").withColumn(
        "filled", F.col("_obs").isNull()
    )
    prec = (
        W.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    if method == "locf":
        out = j.withColumn(
            value_col, F.last("_obs", ignorenulls=True).over(prec)
        )
    elif method == "linear":
        foll = (
            W.partitionBy(key_col)
            .orderBy(bucket_col)
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        ob = F.when(F.col("_obs").isNotNull(), F.col(bucket_col))
        prev_v = F.last("_obs", ignorenulls=True).over(prec)
        prev_b = F.last(ob, ignorenulls=True).over(prec)
        next_v = F.first("_obs", ignorenulls=True).over(foll)
        next_b = F.first(ob, ignorenulls=True).over(foll)
        interp = prev_v + (next_v - prev_v) * (
            (F.col(bucket_col) - prev_b).cast("double")
            / (next_b - prev_b).cast("double")
        )
        out = j.withColumn(
            value_col,
            F.when(~F.col("filled"), F.col("_obs"))
            .when(prev_v.isNotNull() & next_v.isNotNull(), interp)
            .otherwise(F.lit(None).cast("double")),
        )
    elif method == "zero":
        out = j.withColumn(value_col, F.coalesce(F.col("_obs"), F.lit(0.0)))
    else:  # null
        out = j.withColumn(value_col, F.col("_obs"))
    return out.select(key_col, bucket_col, value_col, "filled")
