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


def lttb_downsample(
    series: DataFrame,
    key_col: str,
    t_col: str,
    v_col: str,
    n_out: int,
) -> DataFrame:
    """(key, bucket, t, v) — largest-triangle-three-buckets downsampling
    (Steinarsson 2013), the standard visual-fidelity series reducer: at
    most ``n_out`` points per key, always including the first and last,
    each interior bucket contributing the point with the largest
    triangle area against its neighbor buckets' centroids.

    This is the PARALLEL anchor variant: both triangle anchors are the
    neighbor buckets' (t̄, v̄) centroids rather than the previously
    SELECTED point. Classic LTTB's left anchor is the prior selection —
    a per-key sequential chain; anchoring on centroids makes every
    bucket's argmax independent, so the whole reduction is two grouped
    aggregations and one window, no per-key serial pass. (For bucket 1
    the variants coincide exactly — bucket 0's centroid IS the selected
    first point.)

    Cross-engine determinism: centroids accumulate in DECIMAL(38,6)
    before the double-precision area arithmetic, so the argmax sees
    bit-identical operands under any partitioning (the engine's _davg
    convention); ties break on earliest t. Keys with ≤ n_out points are
    returned whole.

    Scale shape: ranks and buckets are ONE (key)-window pass; centroids
    one groupBy on (key, bucket); anchors a (key)-window lag/lead over
    the bucket-level frame (n_out rows per key); the argmax one
    (key, bucket)-window. All shuffles are on the key the series is
    naturally queried by; nothing is quadratic in points or buckets."""
    if n_out < 3:
        raise ValueError("n_out must be >= 3 (first + last + interior)")
    wk = W.partitionBy(key_col).orderBy("_t", "_v")
    pts = series.select(
        key_col,
        F.col(t_col).alias("_t"),
        F.col(v_col).alias("_v"),
    ).withColumn("_rn", F.row_number().over(wk)).withColumn(
        "_cnt", F.count("*").over(W.partitionBy(key_col))
    )
    # bucket assignment: endpoints own their buckets; interior points
    # split evenly. Small keys (cnt <= n_out) keep every point.
    # integer division (not float floor): exact for any count, and the
    # identical bucket boundary in every engine
    interior = 1 + F.expr(
        f"((_rn - 2) * {n_out - 2}) div (_cnt - 2)"
    )
    bucket = (
        F.when(F.col("_cnt") <= n_out, F.col("_rn") - 1)
        .when(F.col("_rn") == 1, F.lit(0))
        .when(F.col("_rn") == F.col("_cnt"), F.lit(n_out - 1))
        .otherwise(interior)
        .cast("long")
    )
    pts = pts.withColumn("_bkt", bucket)
    # _davg convention: DECIMAL-exact sum, cast to double, THEN one IEEE
    # division — bit-identical in any engine; decimal *division* scale
    # rules are not portable
    cent = pts.groupBy(key_col, "_bkt").agg(
        (
            F.sum(F.col("_t").cast("decimal(38,6)")).cast("double")
            / F.count("*")
        ).alias("_ct"),
        (
            F.sum(F.col("_v").cast("decimal(38,6)")).cast("double")
            / F.count("*")
        ).alias("_cv"),
    )
    wb = W.partitionBy(key_col).orderBy("_bkt")
    anchors = cent.select(
        key_col,
        "_bkt",
        F.lag("_ct").over(wb).alias("_pt"),
        F.lag("_cv").over(wb).alias("_pv"),
        F.lead("_ct").over(wb).alias("_nt"),
        F.lead("_cv").over(wb).alias("_nv"),
    )
    j = pts.join(anchors, [key_col, "_bkt"])
    area = F.abs(
        (F.col("_pt") - F.col("_nt")) * (F.col("_v") - F.col("_pv"))
        - (F.col("_pt") - F.col("_t")) * (F.col("_nv") - F.col("_pv"))
    )
    sel = (
        j.withColumn("_area", area)
        .withColumn(
            "_pick",
            F.row_number().over(
                W.partitionBy(key_col, "_bkt").orderBy(
                    F.col("_area").desc_nulls_last(), F.col("_t")
                )
            ),
        )
        .filter(F.col("_pick") == 1)
    )
    return sel.select(
        key_col,
        F.col("_bkt").alias("bucket"),
        F.col("_t").alias(t_col),
        F.col("_v").alias(v_col),
    )


def mad_anomalies(
    series: DataFrame,
    key_col: str,
    t_col: str,
    v_col: str,
    threshold: float = 3.5,
) -> DataFrame:
    """(key, t, v, score, is_anomaly) — robust per-key outlier flags via
    the modified z-score (Iglewicz & Hoaglin 1993): score = 0.6745 ·
    (v − median) / MAD, flagged when |score| > ``threshold`` (their
    recommended 3.5). Median/MAD instead of mean/stddev so the outliers
    being hunted cannot mask themselves by inflating the spread.

    Degenerate keys (MAD = 0: over half the values identical) get a
    null score, flagged only when v differs from the median at all.

    Exact medians (selection + midpoint interpolation — bit-identical
    across engines for identical inputs), so the flags are deterministic
    under any partitioning. Two grouped aggregations over the key the
    series is already clustered by, then one broadcast-sized join back
    per key — no window over the full point set, no quadratic term."""
    med = series.groupBy(key_col).agg(F.median(v_col).alias("_med"))
    dev = series.join(med, key_col).withColumn(
        "_adev", F.abs(F.col(v_col) - F.col("_med"))
    )
    mad = dev.groupBy(key_col).agg(F.median("_adev").alias("_mad"))
    scored = dev.join(mad, key_col).withColumn(
        "score",
        F.when(
            F.col("_mad") != 0.0,
            F.lit(0.6745) * (F.col(v_col) - F.col("_med")) / F.col("_mad"),
        ),
    )
    return scored.select(
        key_col,
        t_col,
        v_col,
        "score",
        F.when(F.col("_mad") == 0.0, F.col(v_col) != F.col("_med"))
        .otherwise(F.abs(F.col("score")) > F.lit(float(threshold)))
        .alias("is_anomaly"),
    )
