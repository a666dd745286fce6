"""text_doc_profile spill diagnosis (r10 task #7): the r9 256× tier ran
per-4× 5.2 (211 s), READ as per-task spill pressure at fixed partition
bytes rather than plan growth — this sweep verifies that with a
measured knob instead of a hypothesis. One session, the 256× perturbed
replica, `spark.sql.files.maxPartitionBytes` swept (it is a runtime SQL
conf): if the overshoot is spill, smaller input splits (more, smaller
tasks → per-task working set fits the execution-memory share) pull the
wall toward linear; if the wall is flat across the sweep, the overshoot
is not spill and needs a different explanation.

    SPARK_GRAFT_TEXT_SWEEP="134217728,67108864,33554432" \
        python tools/probe_text_sweep.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basic_data_pipeline_spark import get_spark
from basic_data_pipeline_spark.registry import queries

SWEEP = [
    int(v)
    for v in os.environ.get(
        "SPARK_GRAFT_TEXT_SWEEP", "134217728,67108864,33554432"
    ).split(",")
]
TIER_DIR = os.environ.get(
    "SPARK_GRAFT_TEXT_TIER_DIR", "/tmp/spark_graft_sf256x_perturbed"
)
BASE = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("text_sweep")
    q = queries()["text_doc_profile"]
    # warm (JVM/codegen) on the base dir at the default setting
    q(spark, BASE).write.format("noop").mode("overwrite").save()
    for mpb in SWEEP:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb))
        t0 = time.perf_counter()
        q(spark, BASE).write.format("noop").mode("overwrite").save()
        base_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        q(spark, TIER_DIR).write.format("noop").mode("overwrite").save()
        big_s = time.perf_counter() - t0
        print(
            f"maxPartitionBytes={mpb:>10} ({mpb >> 20:>4}m)  "
            f"sf0.1={base_s:6.2f}s  256x={big_s:7.2f}s  "
            f"ratio={big_s / max(base_s, 1e-9):6.1f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
