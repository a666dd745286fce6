"""Interleaved same-session A/B of any registered slot's construct and
exec walls, optionally with per-module tracked_persist disabled.

Usage:
    python tools/ab_slot.py QUERY N CONFIG [CONFIG ...]

CONFIG is '-' (stock) or a comma list of operator module names (e.g.
'dedup,entity') whose `tracked_persist` binding is monkeypatched to
identity for that config's runs — the A/B question "does this
operator's in-operator persist policy help or hurt under the bench
posture" without editing the operator. Modules import the name
directly, so the patch targets each module's own binding.

Timing replicates bench.py: construction (eager driver loops) outside
the timer, noop-sink execution inside; configs interleave round-robin
so session drift cancels.
"""

from __future__ import annotations

import importlib
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basic_data_pipeline_spark import get_spark
from basic_data_pipeline_spark.registry import queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _timed_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _set_persists(disabled_modules: set[str]) -> None:
    from basic_data_pipeline_spark.caching import tracked_persist

    for mod_name in disabled_modules | _ALL_SEEN:
        mod = importlib.import_module(
            f"basic_data_pipeline_spark.operators.{mod_name}"
        )
        mod.tracked_persist = (
            (lambda df: df) if mod_name in disabled_modules else tracked_persist
        )


_ALL_SEEN: set[str] = set()


def main() -> None:
    name = sys.argv[1]
    n = int(sys.argv[2])
    specs = sys.argv[3:]
    configs = [
        (spec, set() if spec == "-" else set(spec.split(",")))
        for spec in specs
    ]
    for _, off in configs:
        _ALL_SEEN.update(off)
    spark = get_spark("ab_slot")
    fn = queries()[name]
    for _, off in configs:  # warm each config once
        _set_persists(off)
        _timed_noop(fn(spark, SF_DIR))
    cons: dict[str, list[float]] = {s: [] for s, _ in configs}
    exe: dict[str, list[float]] = {s: [] for s, _ in configs}
    for rep in range(n):
        for spec, off in configs:
            _set_persists(off)
            spark.sparkContext.setJobDescription(f"ab_slot {name} [{spec}] #{rep}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            cons[spec].append(round(time.perf_counter() - t0, 3))
            exe[spec].append(_timed_noop(df))
    _set_persists(set())
    print(f"\n=== {name} (n={n}, interleaved, sf={SF_DIR}) ===")
    for spec, _ in configs:
        c, e = cons[spec], exe[spec]
        print(
            f"  nopersist={spec:<28} construct med={statistics.median(c):7.3f}"
            f" best={min(c):7.3f} | exec med={statistics.median(e):7.3f}"
            f" best={min(e):7.3f} runs={[round(v, 2) for v in e]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
