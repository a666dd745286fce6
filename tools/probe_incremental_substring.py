"""Increment-cost probe for the persisted substring-dedup gram index
(round 7): time an IDENTICAL batch against a small index (built over
sf0.1 documents) and a 16× index (built over the replicated probe dir).
The bucketed membership joins shuffle only the increment and scan the
index in place, so the ratio should sit near 1 — batch cost tracks the
INCREMENT, not the index (the same property measured for the LSH dedup
index in round 3).

    python tools/probe_incremental_substring.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from basic_data_pipeline_spark import get_spark
from basic_data_pipeline_spark.catalog import load_table
from basic_data_pipeline_spark.operators import incremental_substring as IS
import tools.scale_probe as sp

K = 8
SHIFT = 10_000_000_000


def _salted(docs, tag_expr):
    """Suffix EVERY token with a tag so each replica copy's grams are
    DISTINCT — without this the sharded replication (content unperturbed
    by design) produces a 16× corpus whose gram set is the same size as
    the base, and the index wouldn't actually grow."""
    return docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.split(F.col("text"), r"\s+"),
                lambda x: F.concat(x, tag_expr),
            ),
            " ",
        ).alias("text"),
    )


def main() -> None:
    spark = get_spark("substr_inc_probe")
    if not os.path.isdir(sp.PROBE_DIR):
        print("building probe dir ...", file=sys.stderr)
        sp.build_probe_dir(spark)

    # the SAME increment for both runs: 500 fresh docs (ids far above any
    # corpus id, tokens salted with a tag no corpus copy uses, so only
    # its self-repeats dedup)
    batch = (
        _salted(
            load_table(spark, sp.BASE, "documents").filter(
                F.col("doc_id") < 500
            ),
            F.lit("zq"),
        )
        .select((F.col("doc_id") + SHIFT).alias("doc_id"), "text")
        .localCheckpoint(eager=True)
    )

    for label, src in (("sf0.1", sp.BASE), ("16x", sp.PROBE_DIR)):
        idx = os.path.join(tempfile.mkdtemp(), "sidx")
        # per-copy tag = doc_id // copy-shift (copy 0 at base → tag 'c0'
        # everywhere, same transform both runs for fairness)
        docs = _salted(
            load_table(spark, src, "documents"),
            F.concat(
                F.lit("c"),
                (F.col("doc_id") / F.lit(1_000_000_000)).cast("long").cast(
                    "string"
                ),
            ),
        )
        t0 = time.time()
        IS.build_substring_index(spark, docs, idx, k=K).write.format(
            "noop"
        ).mode("overwrite").save()
        build_s = time.time() - t0
        n_grams = spark.read.parquet(f"{idx}/grams").count()
        t0 = time.time()
        IS.incremental_substring_dedup(spark, batch, idx).write.format(
            "noop"
        ).mode("overwrite").save()
        inc_s = time.time() - t0
        print(
            f"{label:6s} index_grams={n_grams:>9}  build={build_s:6.1f}s "
            f" increment_batch={inc_s:5.1f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
