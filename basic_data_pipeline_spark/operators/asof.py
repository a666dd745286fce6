"""General as-of join via the union+window rewrite (SURVEY.md §2.3).

Spark SQL has no native ASOF join. Two compositions exist:

1. range-join + row_number()=1 (queries/relational.py
   `join_asof_latest_event`) — simple, but materializes every (left ×
   matching-right) pair before pruning: quadratic in the per-key match
   count.
2. THIS operator: union both sides, one window per key ordered by
   (ts, side), and `last(value, ignorenulls=True)` carries the most
   recent right-side value forward onto each left row. Linear in
   |left|+|right|, exactly ONE shuffle (the window's hash partition by
   key), no pair blowup — the shape that survives 100 TB with hot keys
   (a key's cost is its own row count, and AQE cannot help a quadratic
   range join that already exploded).

Backward as-of semantics (right.ts <= left.ts; ties take the right row):
right rows sort before left rows at equal ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the `value_cols` of the most recent right
    row with the same `key` and right.ts <= left.ts (null if none).

    `right` must be unique per (key, ts) — pre-aggregate ties; the output
    value columns are renamed with `suffix` so they never collide with
    left's columns."""
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {overlap}")

    l = left.withColumn("_src", F.lit(1))
    # The carried payload is a STRUCT of the value columns: the struct is
    # non-null for every right row even when its fields are null, so a
    # matched right row with a null value correctly yields null (instead
    # of ignorenulls skipping back to a stale earlier value).
    r = right.select(
        key,
        ts,
        F.struct(*[F.col(c) for c in value_cols]).alias("_rpayload"),
    ).withColumn("_src", F.lit(0))
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        W.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_src").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.withColumn(
        "_carried", F.last("_rpayload", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("_src") == 1).select(
        "*",
        *[F.col(f"_carried.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out.drop("_src", "_rpayload", "_carried")
