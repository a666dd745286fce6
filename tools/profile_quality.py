"""One-off attribution for op_quality_profile's 16x ratio (round-7,
VERDICT #3): time the single-pass profile aggregation with and without
its per-column approx_count_distinct (HLL) terms, at sf0.1 and on the
16x probe dir, to measure which aggregate family carries the compute.

    python tools/profile_quality.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from basic_data_pipeline_spark import get_spark
from basic_data_pipeline_spark.catalog import load_table
import tools.scale_probe as sp


def bundles(df, with_nd: bool, with_rest: bool, rsd: float | None = None):
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(df.columns):
        col = df[c]
        if with_nd:
            nd = (
                F.approx_count_distinct(col, rsd)
                if rsd is not None
                else F.approx_count_distinct(col)
            )
            aggs.append(nd.alias(f"__nd_{i}"))
        if with_rest:
            aggs += [
                F.sum(col.isNull().cast("long")).alias(f"__null_{i}"),
                F.min(col).cast("string").alias(f"__min_{i}"),
                F.max(col).cast("string").alias(f"__max_{i}"),
            ]
    return df.agg(*aggs)


def timed(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    spark = get_spark("profile_quality")
    if not os.path.isdir(sp.PROBE_DIR):
        print("building probe dir ...", file=sys.stderr)
        sp.build_probe_dir(spark)
    variants = {
        "scan_only": lambda df: df.agg(F.count(F.lit(1)).alias("n")),
        "rest_only": lambda df: bundles(df, with_nd=False, with_rest=True),
        "hll_only": lambda df: bundles(df, with_nd=True, with_rest=False),
        "hll_rsd10_only": lambda df: bundles(
            df, with_nd=True, with_rest=False, rsd=0.10
        ),
        "full": lambda df: bundles(df, with_nd=True, with_rest=True),
    }
    for d, label in ((sp.BASE, "sf0.1"), (sp.PROBE_DIR, "16x")):
        li = load_table(spark, d, "lineitem")
        timed(li.agg(F.count(F.lit(1))))  # warm the scan
        for name, make in variants.items():
            best = min(timed(make(li)) for _ in range(2))
            print(f"{label:6s} {name:16s} {best:7.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
