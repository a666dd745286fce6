"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed once to warm the JVM/code-cache (warmup not timed
separately — we time a fresh action after a count-based warmup of the input
scans), then timed with a full collect() so the measurement covers plan,
shuffle, and result materialization.
"""

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
        fn(spark, SF_DIR).collect()
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
