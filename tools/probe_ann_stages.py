"""Stage attribution for the width-safe ANN code-attach path (r9 verdict
watch item #1 / r10 task #6): the 256× forced-no-broadcast tier finished
inside the cumulative linear envelope but its LAST decade ran per-4× 6.9,
attributed (by reasoning, not measurement) to auto plane growth (n·log n
bucketing) plus the SQ8 decode-dot premium. This probe slices the same
configuration (`op_ann_lsh_codeattach`: embeddings, dim 64, k 3, auto
planes, broadcast_vectors=False, honest/perturbed replicas) into stage
walls via similarity.ann_topk_lsh(probe_walls=...):

  bucketing   spread + n_tables×n_planes hyperplane folds + explode
  candidates  (t, bucket) self-join + distinct pair set
  shortlist   SQ8 fit/encode + code attach + reconstructed-cosine
              window top k·rerank_factor
  rerank      exact cosine on the shortlist + final top-k window
              (= total − the above, timed as the returned plan)

Stage walls are cumulative-plan-free: each stage's frame is persisted or
derived from the previous stage's persisted/materialized result, so a
wall measures that stage's own work on this tier.

    SPARK_GRAFT_ANN_TIERS="16,64,256" python tools/probe_ann_stages.py

Uses the *_perturbed replica dirs (the honest corpus — no cross-copy
duplicate pile-ups), matching the SCALING.md op_ann_lsh_codeattach rows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basic_data_pipeline_spark import get_spark
from basic_data_pipeline_spark.caching import release_persisted
from basic_data_pipeline_spark.catalog import load_table
from basic_data_pipeline_spark.operators import similarity

TIERS = [
    int(t)
    for t in os.environ.get("SPARK_GRAFT_ANN_TIERS", "16,64,256").split(",")
]


def main() -> None:
    spark = get_spark("ann_stage_probe")
    rows = [("sf0.1", "/root/testdata/sf0.1")] + [
        (f"{n}x", f"/tmp/spark_graft_sf{n}x_perturbed") for n in TIERS
    ]
    for label, d in rows:
        if not os.path.isdir(d):
            raise SystemExit(f"missing probe dir {d}")
    for label, d in rows:
        walls: dict = {}
        t0 = time.perf_counter()
        out = similarity.ann_topk_lsh(
            load_table(spark, d, "embeddings"),
            dim=64,
            k=3,
            n_planes=None,
            broadcast_vectors=False,
            probe_walls=walls,
        )
        out.write.format("noop").mode("overwrite").save()
        total = round(time.perf_counter() - t0, 2)
        staged = sum(walls.values())
        walls["rerank"] = round(total - staged, 2)
        walls["total"] = total
        print(
            f"{label:6s} "
            + "  ".join(f"{k}={v:8.2f}s" for k, v in walls.items()),
            flush=True,
        )
        release_persisted()
    spark.stop()


if __name__ == "__main__":
    main()
