"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

The session is warmed once (JVM classloading, codegen compiler) before
timing. Each query is then timed through the `noop` sink: it executes the
full plan and materializes EVERY output column (count() would let Spark
prune the work away) without `collect()`'s py4j row serialization, which
for the full-table queries costs multiples of the engine time and measures
the Python driver, not the engine.

Noise control: the whole suite runs $SPARK_GRAFT_BENCH_RUNS times
(default 3) and each query reports its BEST time across runs — one slow
run from GC, page-cache misses, or driver-side scheduling noise cannot
masquerade as a code regression (the r2→r3 q3/q5 drift investigation).
`value` is the sum of the per-query bests; `runs` records the repeat
count."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from basic_data_pipeline_spark import get_spark
from basic_data_pipeline_spark.registry import headline_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def main() -> None:
    spark = get_spark("bench")
    qs = headline_queries()
    # warm the session (JVM classloading, codegen compiler) on the smallest
    # query once; per-query numbers below are per-run cold-cache plans.
    # Error isolation everywhere: one broken query must not zero the whole
    # artifact (BENCH_r04 lesson — the warm-up threw and rc=1 lost every
    # number). Failures are recorded per-query and the JSON line always
    # prints.
    errors: dict[str, str] = {}
    try:
        next(iter(qs.values()))(spark, SF_DIR).count()
    except Exception as exc:  # noqa: BLE001 — warm-up is best-effort
        errors["_warmup"] = f"{type(exc).__name__}: {exc}"[:500]

    best: dict[str, float] = {}
    for _ in range(N_RUNS):
        for name, fn in qs.items():
            if name in errors:
                continue
            t0 = time.time()
            try:
                fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # noqa: BLE001 — isolate per query
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                best.pop(name, None)
                continue
            dt = round(time.time() - t0, 3)
            if name not in best or dt < best[name]:
                best[name] = dt
    total = round(sum(best.values()), 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "headline_suite_wall_time",
        "value": total,
        "unit": "sec",
        "queries": best,
        "runs": N_RUNS,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        payload["errors"] = errors
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
