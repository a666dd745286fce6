"""Mergeable count-min sketch as a DataFrame (frequency estimation).

Rounds out the sketch surface next to Spark's native HLL
(approx_count_distinct) and quantile (approx_percentile) sketches with
the classic Cormode-Muthukrishnan count-min structure (public
literature): d independent hash rows × w buckets of counters; an item's
estimate is the MIN of its d counters — never an underestimate, and at
most true + N·e/w over (standard guarantee).

Why as a DataFrame: the sketch IS a (d × w)-row table, so building it is
one groupBy shuffle whose output size is d × w REGARDLESS of input size,
partial aggregation does the map-side combining, and two sketches over
disjoint corpus shards merge by union + sum — the mergeability that lets
100 TB of shards sketch independently and combine at d × w cost. No
driver-side state, no UDFs, deterministic hashes (xxhash64 with a fixed
per-row salt).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(item: Column, h: int, width: int) -> Column:
    return F.pmod(F.xxhash64(F.lit(f"cms{h}"), item), F.lit(width))


def cms_build(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """(h, bucket, cnt): sketch the frequencies of `item_col`. One
    explode (×depth) + one groupBy — d × w output rows max."""
    item = F.col(item_col)
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(h).alias("h"),
                        _bucket(item, h, width).alias("bucket"),
                    )
                    for h in range(depth)
                ]
            )
        ).alias("e")
    ).select(F.col("e.h").alias("h"), F.col("e.bucket").alias("bucket"))
    return rows.groupBy("h", "bucket").agg(F.count("*").alias("cnt"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Combine sketches built with the same (depth, width): counters add.
    union + re-aggregate — associative and commutative, so any shard tree
    merges to the same sketch as one pass over the full corpus."""
    return (
        a.unionByName(b).groupBy("h", "bucket").agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, items: DataFrame, item_col: str, width: int = 1024
) -> DataFrame:
    """(item, est): point-frequency estimates for `items` (distinct) —
    min over the d rows of each item's counter. The sketch side is tiny
    (d × w), so it broadcasts; absent counters count as 0 via the depth
    check (an item hashing to an untouched bucket has true count 0)."""
    depth = None  # derived from the sketch itself, one tiny aggregate
    depth = sketch.select(F.max("h")).first()[0] + 1
    probes = items.select(F.col(item_col).alias("item")).distinct()
    probes = probes.select(
        "item",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(h).alias("h"),
                        _bucket(F.col("item"), h, width).alias("bucket"),
                    )
                    for h in range(depth)
                ]
            )
        ).alias("e"),
    ).select("item", F.col("e.h").alias("h"), F.col("e.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["h", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
