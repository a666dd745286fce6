"""Scale probe for the persisted BM25 inverted index (round 8): build
the index over sf0.1 documents and over the 16× replicated probe dir,
then time (a) an IDENTICAL 500-doc append against both — appends never
read the index, so the ratio should sit near 1 — and (b) a FIXED
100-query search against both, next to the one-shot bm25_topk on the
same corpus — search skips the corpus-side postings build / df agg the
one-shot pays, and its residual growth is the candidate volume itself
(fixed query vocabulary → every term's postings list grows with the
corpus; candidates ∝ n is the workload's own size, see SCALING.md
op_bm25_topk).

    python tools/probe_retrieval_index.py
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
from basic_data_pipeline_spark.operators import incremental_retrieval as IR
from basic_data_pipeline_spark.operators import retrieval
import tools.scale_probe as sp

SHIFT = 10_000_000_000


def main() -> None:
    """Tiers (r10, verdict item #3): SPARK_GRAFT_RETR_TIERS="16,64,256"
    probes the persisted index across ALL those replica dirs in ONE
    session (same-session ratios, the SCALING.md convention) instead of
    the single PROBE_DIR pair. Unperturbed replicas are the HONEST
    retrieval model here: real corpora keep term-df FRACTIONS roughly
    constant as they grow, so a fixed query batch's candidate volume
    growing ∝ n is the workload's own size (op_bm25_topk attribution);
    the perturbed dirs would pin df constant and trivially flatten the
    search. max_df_frac cuts are df-FRACTION-based and scale-invariant
    under replication, so the hot-term cut behavior is exercised
    identically at every tier."""
    spark = get_spark("retr_idx_probe")
    tiers_env = os.environ.get("SPARK_GRAFT_RETR_TIERS", "")
    if tiers_env:
        tiers = [("sf0.1", sp.BASE)] + [
            (f"{n}x", f"/tmp/spark_graft_sf{n}x")
            for n in (int(t) for t in tiers_env.split(","))
        ]
        for label, d in tiers:
            if not os.path.isdir(d):
                raise SystemExit(f"missing probe dir {d} for tier {label}")
    else:
        tiers = [("sf0.1", sp.BASE), (f"{sp.COPIES}x", sp.PROBE_DIR)]
        if not os.path.isdir(sp.PROBE_DIR):
            print("building probe dir ...", file=sys.stderr)
            sp.build_probe_dir(spark)

    base_docs = load_table(spark, sp.BASE, "documents").select(
        "doc_id", "text"
    )
    # the SAME increment and query batch for both runs
    batch = (
        base_docs.filter(F.col("doc_id") < 500)
        .select((F.col("doc_id") + SHIFT).alias("doc_id"), "text")
        .localCheckpoint(eager=True)
    )
    queries = (
        base_docs.filter(F.col("doc_id") < 100)
        .select(
            F.col("doc_id").alias("query_id"),
            F.col("text").alias("query_text"),
        )
        .localCheckpoint(eager=True)
    )

    for label, src in tiers:
        docs = load_table(spark, src, "documents").select("doc_id", "text")
        idx = os.path.join(tempfile.mkdtemp(), "ridx")

        t0 = time.time()
        IR.build_retrieval_index(spark, docs, idx)
        build_s = time.time() - t0
        n_postings = spark.read.parquet(f"{idx}/postings").count()

        t0 = time.time()
        IR.incremental_retrieval_append(spark, batch, idx).write.format(
            "noop"
        ).mode("overwrite").save()
        append_s = time.time() - t0

        t0 = time.time()
        IR.search_retrieval_index(
            spark, queries, idx, 10, max_df_frac=0.5
        ).write.format("noop").mode("overwrite").save()
        search_s = time.time() - t0

        t0 = time.time()
        retrieval.bm25_topk(
            docs, queries, 10, max_df_frac=0.5
        ).write.format("noop").mode("overwrite").save()
        oneshot_s = time.time() - t0

        print(
            f"{label:6s} postings={n_postings:>10}  build={build_s:6.1f}s"
            f"  append={append_s:5.1f}s  search={search_s:6.1f}s"
            f"  one-shot={oneshot_s:6.1f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
