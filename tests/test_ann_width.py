"""Width-safe ANN vector attach (r8 verdict item #1): beyond the
broadcast ceiling, ann_topk_lsh must never widen the candidate-pair
frame with two raw dim-double arrays through a shuffle exchange — the
256× honest probe died on disk exactly that way before
`broadcast_vectors` landed, and past 512 MB of raw vectors the wide
shuffle join used to return by design.

The fallback path attaches SQ8 codes (4-8× narrower; broadcast when the
code table fits, shuffle otherwise), shortlists top k·rerank_factor per
query by reconstructed cosine, and reranks ONLY the shortlist with raw
vectors — so the raw-vector join is k-bounded (linear in n), and no
exchange ever carries both pair-side raw arrays."""

from __future__ import annotations

import pytest

#: slow tier (r12): dimension-width parameter sweep; the width contract's base case stays in test_ann_stream.py/test_embeddings.py
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _pairs(df):
    return {
        (r["query_id"], r["neighbor_id"]): (r["rank"], round(r["cos"], 9))
        for r in df.collect()
    }


def test_code_attach_matches_broadcast_path(spark, emb):
    """Forcing broadcast_vectors=False (simulating a raw table beyond
    the ceiling) must reproduce the broadcast path's results: identical
    candidate set, exact-cosine rerank, same top-k (the SQ8 shortlist at
    rerank_factor=4 has overwhelming slack at fixture scale)."""
    a = _pairs(
        similarity.ann_topk_lsh(emb, 64, 5, broadcast_vectors=True)
    )
    b = _pairs(
        similarity.ann_topk_lsh(emb, 64, 5, broadcast_vectors=False)
    )
    assert a, "fixture should produce neighbors"
    # exact agreement expected here; tolerate only shortlist-boundary
    # churn (none observed at fixture scale — keep the gate tight)
    assert a == b


def test_code_attach_partitioning_invariance(spark, emb):
    a = _pairs(
        similarity.ann_topk_lsh(
            emb.repartition(1), 64, 3, broadcast_vectors=False
        )
    )
    b = _pairs(
        similarity.ann_topk_lsh(
            emb.repartition(7, "vec_id"), 64, 3, broadcast_vectors=False
        )
    )
    assert a == b


def _exchange_inputs(formatted: str) -> list[str]:
    """Input column lists of every shuffle Exchange node in a
    formatted plan."""
    out = []
    lines = formatted.splitlines()
    for i, ln in enumerate(lines):
        if ") Exchange" not in ln:
            continue
        for nxt in lines[i + 1 : i + 4]:
            if nxt.strip().startswith("Input"):
                out.append(nxt)
                break
    return out


def test_no_exchange_carries_two_raw_vectors(spark, emb):
    """The invariant the 256× probe enforces, asserted on the plan: no
    shuffle exchange's input carries BOTH pair-side raw vector arrays
    (qv & cv). The only wide exchange allowed is the k-bounded shortlist
    rerank carrying ONE side's array."""
    df = similarity.ann_topk_lsh(emb, 64, 5, broadcast_vectors=False)
    formatted = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )
    for inp in _exchange_inputs(formatted):
        assert not ("qv#" in inp and "cv#" in inp), (
            "pair rows carried two raw vectors through an exchange:\n"
            + inp
        )


def test_code_attach_shortlist_bounds_rerank(spark, emb):
    """The rerank input is bounded by k·rerank_factor per query — the
    linear-in-n contract. Checked black-box: a tiny rerank_factor must
    still return k rows per query (shortlist >= k always)."""
    out = similarity.ann_topk_lsh(
        emb, 64, 4, broadcast_vectors=False, rerank_factor=1
    )
    per = (
        out.groupBy("query_id")
        .agg(F.count("*").alias("n"), F.max("rank").alias("mr"))
        .collect()
    )
    assert per
    for r in per:
        assert r["n"] <= 4 and r["mr"] <= 4
