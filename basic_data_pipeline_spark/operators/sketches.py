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
from pyspark.sql.window import Window as W


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


# --- Misra-Gries / mergeable heavy hitters --------------------------------
#
# The deterministic counter-based complement to count-min: a k-counter
# Misra-Gries summary guarantees every item with true frequency
# > n/(k+1) survives, estimates never exceed the truth, and the
# underestimate is at most n/(k+1) — the classic frequent-items
# guarantee (Misra & Gries 1982; mergeability per Agarwal et al. 2012,
# "Mergeable Summaries": summaries ADD by summing counters and then
# subtracting the (k+1)-th largest summed value).
#
# Distributed shape: each partition runs the sequential algorithm over
# its own rows (Arrow-batched — the per-row dict update is the one
# inherently sequential piece), emitting ≤ k counters per partition;
# the merge is a vocab-tiny groupBy + one global decrement. The heavy
# work — the full scan — happens exactly once, partition-parallel, and
# only #partitions × k counter rows ever shuffle.


def mg_partition_summaries(
    df: DataFrame, item_col: str, k: int
) -> DataFrame:
    """(item, cnt): one ≤ k-counter Misra-Gries summary per partition."""
    import pandas as pd

    if k < 1:
        raise ValueError("need k >= 1")

    def run(batches):
        counters: dict = {}
        for pdf in batches:
            for v in pdf[item_col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all step, dropping zeros
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "cnt": list(counters.values())}
            )

    schema = df.select(F.col(item_col).alias("item")).schema
    out_schema = f"item {schema['item'].dataType.simpleString()}, cnt long"
    return df.select(F.col(item_col).alias(item_col)).mapInPandas(
        lambda it: run(it), out_schema
    )


def mg_merge(summaries: DataFrame, k: int) -> DataFrame:
    """(item, est): merge any union of Misra-Gries summaries — sum
    counters per item, subtract the (k+1)-th largest summed value
    (0 when fewer than k+1 items), keep positive counters, cap at k.
    The result obeys the same n/(k+1) underestimate bound over the
    combined input (mergeable-summaries theorem)."""
    summed = summaries.groupBy("item").agg(F.sum("cnt").alias("cnt"))
    ranked = summed.withColumn(
        "_rk",
        F.row_number().over(
            W.partitionBy().orderBy(F.desc("cnt"), F.asc("item"))
        ),
    )
    kth1 = ranked.filter(F.col("_rk") == k + 1).select("cnt").collect()
    dec = int(kth1[0]["cnt"]) if kth1 else 0
    return (
        ranked.filter(F.col("_rk") <= k)
        .select("item", (F.col("cnt") - dec).alias("est"))
        .filter(F.col("est") > 0)
    )


def heavy_hitters(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """(item, est): the composed one-call frequent-items sketch — every
    item with true frequency > n/(k+1) is guaranteed present, every
    estimate is ≤ the true count, and the underestimate is ≤ n/(k+1).
    One partition-parallel scan + a (#partitions × k)-row merge."""
    return mg_merge(mg_partition_summaries(df, item_col, k), k)
