"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

The session is warmed once (JVM classloading, codegen compiler) before
timing. Each query is then timed through the `noop` sink: it executes the
full plan and materializes EVERY output column (count() would let Spark
prune the work away) without `collect()`'s py4j row serialization, which
for the full-table queries costs multiples of the engine time and measures
the Python driver, not the engine."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from basic_data_pipeline_spark import get_spark
from basic_data_pipeline_spark.registry import headline_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("bench")
    timings: dict[str, float] = {}
    qs = headline_queries()
    # warm the session (JVM classloading, codegen compiler) on the smallest
    # query once; per-query numbers below are single cold-cache runs.
    next(iter(qs.values()))(spark, SF_DIR).count()

    t_total0 = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    total = round(time.time() - t_total0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
