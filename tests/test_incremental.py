"""Incremental-dedup tests: batch-at-a-time must match full-corpus dedup
on the fixture (whose planted near-dups are disjoint pairs, so the greedy
chain caveat documented in operators/incremental.py does not bite), and
the index must make cross-batch duplicates drop without re-reading corpus
text."""

from __future__ import annotations

from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import dedup, incremental

SF_DIR = "/root/testdata/sf0.001"
THRESH = 0.5


def _full_survivors(docs):
    sh = dedup.word_shingles(docs, "doc_id", "text", 3)
    pairs = dedup.jaccard_pairs(sh, "doc_id", THRESH)
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return {
        r["doc_id"] for r in docs.join(dropped, "doc_id", "left_anti").collect()
    }


def test_incremental_matches_full_dedup(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    cut = 250
    b1 = docs.filter(F.col("doc_id") < cut)
    b2 = docs.filter(F.col("doc_id") >= cut)

    idx = str(tmp_path / "dedup_index")
    s1 = incremental.build_index(spark, b1, idx)
    s2 = incremental.incremental_dedup(spark, b2, idx)
    got = {r["doc_id"] for r in s1.collect()} | {
        r["doc_id"] for r in s2.collect()
    }

    expected = _full_survivors(docs)
    assert got == expected

    # the planted dups must actually exercise BOTH paths: some dropped
    # within a batch, and the index must be non-trivial
    assert len(expected) < docs.count()
    assert spark.read.parquet(f"{idx}/bands").count() > 0


def test_incremental_drops_cross_batch_duplicate(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    b1 = docs.filter(F.col("doc_id") < 100)
    idx = str(tmp_path / "idx")
    incremental.build_index(spark, b1, idx)

    # clone an indexed doc under a new id: must be dropped; a fresh
    # unique doc must survive and join the index
    clone = b1.filter(F.col("doc_id") == 7).select(
        F.lit(900001).alias("doc_id"),
        "text",
        *[c for c in b1.columns if c not in ("doc_id", "text")],
    )
    fresh = spark.createDataFrame(
        [(900002, "utterly unique words never seen in the fixture corpus")],
        "doc_id long, text string",
    )
    newb = clone.select("doc_id", "text").unionByName(fresh)

    before = spark.read.parquet(f"{idx}/bands").select("doc_id").distinct().count()
    surv = incremental.incremental_dedup(spark, newb, idx)
    ids = {r["doc_id"] for r in surv.collect()}
    assert ids == {900002}
    after = spark.read.parquet(f"{idx}/bands").select("doc_id").distinct().count()
    assert after == before + 1


def test_ivf_index_build_add_search(spark, tmp_path):
    """Persisted IVF index: build on half the vectors, append the rest
    via assignment-only (no retraining), then search the full index —
    results must equal the in-memory ivf_topk pipeline given the SAME
    centroids, and appended vectors must be findable."""
    from basic_data_pipeline_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    half1 = emb.filter(F.col("vec_id") % 2 == 0)
    half2 = emb.filter(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "ivf")

    similarity.ivf_build_index(half1, idx, dim=64)
    similarity.ivf_index_add(half2, idx, dim=64)

    stored = spark.read.parquet(f"{idx}/assigned")
    assert stored.count() == emb.count()
    assert stored.select("vec_id").distinct().count() == emb.count()

    queries = emb.filter(F.col("vec_id") < 10)
    got = similarity.ivf_index_search(queries, idx, dim=64, k=3, nprobe=2)
    rows = got.collect()
    assert {r["query_id"] for r in rows} == set(range(10))
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert all(len(v) == 3 for v in per_q.values())

    # odd (appended) vectors appear as neighbors — the add path is live
    assert any(n % 2 == 1 for v in per_q.values() for n in v)
