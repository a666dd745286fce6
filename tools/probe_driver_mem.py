"""Driver-side memory bound probe (r10 verdict item #6): the engine's
`.collect()` sites are all bounded BY ARGUMENT (control-plane frames —
per-partition totals, per-source counts, one argmax row per vocab round,
a merge-bounded alias log, a capped Bloom literal). This probe turns the
adjectives into NUMBERS at a big tier: for each representative class it
runs the real operation and reports rows collected + tracemalloc-measured
Python-heap delta + peak (the JVM is a separate process; tracemalloc is
exactly the driver-side Python allocation the bound claims).

    SPARK_GRAFT_MEM_TIER=256 python tools/probe_driver_mem.py

Classes measured (one representative per class; the other collect sites
share the shape):

  pack_offsets    packing.pack_sequences construction — the distributed
                  prefix sum's per-partition totals collect (#partitions
                  rows, independent of corpus size)
  mix_counts      sampling.temperature_mix — per-stratum counts collect
                  (#sources rows)
  bloom_literal   packing.bloom_build over the benchmark shingle set —
                  the plan-literal bigint array (m_bits/64 words, capped
                  at BLOOM_MAX_BITS = 32 MiB)
  alias_fold      incremental_linkgraph.load_alias_map over a synthetic
                  merge log (merge-bounded rows; reports bytes/row so any
                  real log's bound is rows × that)
  bpe_round       bpe.train_bpe 3 merge rounds on the tier corpus slice —
                  the per-round driver data is ONE argmax row + the
                  Python merge list

Results go to SCALING.md as a table; the probe is a measurement harness,
not a gate.
"""

from __future__ import annotations

import os
import sys
import time
import tracemalloc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from basic_data_pipeline_spark import get_spark
from basic_data_pipeline_spark.operators import bpe, packing, sampling

TIER = int(os.environ.get("SPARK_GRAFT_MEM_TIER", "256"))


def _measure(label, fn):
    tracemalloc.start()
    t0 = time.perf_counter()
    out = fn()
    wall = time.perf_counter() - t0
    cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    print(
        f"{label:14s} retained={cur / 1e6:8.2f}MB peak={peak / 1e6:8.2f}MB "
        f"wall={wall:7.1f}s {out}",
        flush=True,
    )


def main() -> None:
    d = f"/tmp/spark_graft_sf{TIER}x_perturbed"
    if not os.path.isdir(d):
        raise SystemExit(f"missing probe dir {d} (tools/scale_probe.py)")
    spark = get_spark("driver_mem_probe")
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    n_docs = docs.count()
    print(f"tier {TIER}x: {n_docs} docs", flush=True)

    def pack_offsets():
        out = packing.pack_sequences(
            docs, "doc_id", F.size(F.split(F.lower("text"), r"\s+")), 2048
        )
        n = out.count()  # construction already ran the totals collect
        return f"(packed {n} docs; totals rows = defaultParallelism)"

    _measure("pack_offsets", pack_offsets)

    def mix_counts():
        out = sampling.temperature_mix(docs, "source", 2.0, id_col="doc_id")
        return f"(mixed {out.count()} rows; counts rows = #sources)"

    _measure("mix_counts", mix_counts)

    def bloom_literal():
        bench = docs.filter(F.col("doc_id") % 97 == 0)
        sh = packing.word_shingles(bench, "doc_id", "text", 8).select(
            F.col("shingle")
        )
        words, m_bits, k = packing.bloom_build(sh)
        return (
            f"(words={len(words)} m_bits={m_bits} k={k} "
            f"literal={len(words) * 8 / 1e6:.2f}MB as bigints)"
        )

    _measure("bloom_literal", bloom_literal)

    def alias_fold():
        from basic_data_pipeline_spark.operators import (
            incremental_linkgraph as ilg,
        )

        n = 100_000
        mg = spark.range(n).select(
            (F.col("id") + 1_000_000).alias("old"),
            (F.col("id") % 1000).alias("new"),
            F.col("id").alias("_wm"),
        )
        path = "/tmp/spark_graft_mem_probe_merges"
        mg.write.mode("overwrite").parquet(os.path.join(path, "merges"))
        fold = ilg.load_alias_map(spark, path)
        return f"(folded {len(fold)} merges -> dict)"

    _measure("alias_fold", alias_fold)

    def bpe_round():
        merges = bpe.train_bpe(
            docs.filter(F.col("doc_id") % 16 == 0), "text", 3
        )
        return f"(3 rounds, merge list len {len(merges)})"

    _measure("bpe_round", bpe_round)

    spark.stop()


if __name__ == "__main__":
    main()
