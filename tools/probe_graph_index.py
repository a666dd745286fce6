"""Increment-cost probe for the persisted link-graph index (round-8
continuation): time an IDENTICAL edge batch against a small index
(built over the sf0.1 synthetic crawl graph) and a 16× index (the
replicated probe dir's graph). Per-batch work is the increment's
bucketed joins plus a toy contracted-merge WCC, with the corpus tables
scanning in place — so the ratio should sit near 1: batch cost tracks
the INCREMENT, not the index (the property the substring/LSH/retrieval
index probes measure for their families).

    python tools/probe_graph_index.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from basic_data_pipeline_spark import get_spark
from basic_data_pipeline_spark.operators import incremental_linkgraph as G
import tools.scale_probe as sp

SHIFT = 10_000_000_000


def main() -> None:
    spark = get_spark("graph_inc_probe")
    if not os.path.isdir(sp.PROBE_DIR):
        print("building probe dir ...", file=sys.stderr)
        sp.build_probe_dir(spark)

    # the SAME increment for both runs: 2000 fresh crawl pages (srcs far
    # above any corpus id — the monotone-src convention), each linking
    # to 2 fresh + 1 existing node, so every batch exercises new-node
    # labeling AND component merges against the index
    batch = (
        spark.range(2000)
        .select((F.col("id") + SHIFT).alias("src"))
        .select(
            "src",
            F.explode(
                F.array(
                    F.col("src") + 1_000_000,
                    F.col("src") + 1_000_001,
                    F.pmod(F.col("src") * 31, F.lit(400)),
                )
            ).alias("dst"),
        )
        .localCheckpoint(eager=True)
    )

    for label, src_dir in (("sf0.1", sp.BASE), ("16x", sp.PROBE_DIR)):
        idx = os.path.join(tempfile.mkdtemp(), "gidx")
        _docs, edges = sp._synthetic_copy_graph(spark, src_dir)
        t0 = time.time()
        G.build_graph_index(spark, edges, idx).write.format("noop").mode(
            "overwrite"
        ).save()
        build_s = time.time() - t0
        n_edges = spark.read.parquet(f"{idx}/edges").count()
        t0 = time.time()
        G.add_edges(spark, batch, idx).write.format("noop").mode(
            "overwrite"
        ).save()
        inc_s = time.time() - t0
        print(
            f"{label:6s} index_edges={n_edges:>9}  build={build_s:6.1f}s "
            f" increment_batch={inc_s:5.1f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
