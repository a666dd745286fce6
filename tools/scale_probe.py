"""16× scale probe: replicate the sf0.1 fixtures into a synthetic ~sf1.6
directory (every key column shifted per copy, so each copy is a
self-contained shard — joins and groupings stay consistent within a copy
and cardinalities grow 16×), then time the headline queries on both.

    python tools/scale_probe.py                # all headline queries
    python tools/scale_probe.py window_ dedup  # substring filters

Prints one line per query: name, sf0.1 seconds, 16× seconds, ratio. A
ratio well above ~16/parallel-headroom flags a super-linear operator —
how `dedup_ngram_jaccard`'s quadratic inverted-index join was caught in
round 1 (SCALING.md). Results are recorded in SCALING.md, not asserted:
the probe is a measurement harness, not a pass/fail gate.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from basic_data_pipeline_spark import get_spark
from basic_data_pipeline_spark.catalog import TABLES, load_table
from basic_data_pipeline_spark.registry import headline_queries

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROBE_DIR = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/spark_graft_sf16x")
COPIES = int(os.environ.get("SPARK_GRAFT_PROBE_COPIES", "16"))
SHIFT = 1_000_000_000  # key offset per copy; far above any fixture key

# Columns that identify/join rows — shifted per copy so every copy is a
# closed shard (orders.o_custkey still finds its customer, events keep
# their per-user ordering, LSH pairs stay within-copy only if content
# differs — content columns are NOT perturbed, so dedup queries see every
# bucket 16× hot: the adversarial case we WANT to measure).
KEYish = ("key", "_id", "id")


def _is_key(col: str) -> bool:
    return col.endswith(KEYish) or col in ("user_id",)


def build_probe_dir(spark) -> None:
    if os.path.isdir(PROBE_DIR):
        shutil.rmtree(PROBE_DIR)
    copies = spark.range(COPIES).select(F.col("id").alias("_copy"))
    for name in TABLES:
        df = load_table(spark, BASE, name)
        rep = df.crossJoin(copies)
        for c, t in df.dtypes:
            if _is_key(c) and t in ("bigint", "int", "long"):
                rep = rep.withColumn(c, F.col(c) + F.col("_copy") * SHIFT)
        rep.drop("_copy").write.mode("overwrite").parquet(
            f"{PROBE_DIR}/{name}.parquet"
        )


def main() -> None:
    spark = get_spark("scale_probe")
    filters = sys.argv[1:]
    qs = {
        n: fn
        for n, fn in headline_queries().items()
        if not filters or any(f in n for f in filters)
    }
    print(f"building {COPIES}x probe dir at {PROBE_DIR} ...", file=sys.stderr)
    build_probe_dir(spark)

    # warm
    next(iter(qs.values()))(spark, BASE).write.format("noop").mode(
        "overwrite"
    ).save()

    for name, fn in qs.items():
        t0 = time.time()
        fn(spark, BASE).write.format("noop").mode("overwrite").save()
        base_s = time.time() - t0
        t0 = time.time()
        fn(spark, PROBE_DIR).write.format("noop").mode("overwrite").save()
        big_s = time.time() - t0
        print(
            f"{name:28s} sf0.1={base_s:6.2f}s  {COPIES}x={big_s:7.2f}s "
            f" ratio={big_s / max(base_s, 1e-9):5.1f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
