"""Pluggable lineage cuts (r10 verdict item #1): every iterative
operator truncates lineage through caching.tracked_local_checkpoint,
which now carries a session-level mode — ``local`` (executor-resident
localCheckpoint: fastest, single-box, dies with a lost executor) vs
``reliable`` (parquet staging under a durable dir: survives executor
loss; the pipeline ``workdir=`` durability model generalized to every
cut). The contract pinned here: BOTH modes produce bit-identical
results on the three representative iterative shapes the verdict names
(pagerank rounds, BPE vocab rounds, the pack_sequences prefix-sum pin),
and reliable-mode storage is actually staged and actually freed."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark import caching
from basic_data_pipeline_spark.operators import bpe, linkgraph, packing


def test_mode_validation(tmp_path):
    with pytest.raises(ValueError, match="local.*or.*reliable"):
        caching.set_lineage_cut_mode("durable")
    with pytest.raises(ValueError, match="staging_dir"):
        caching.set_lineage_cut_mode("reliable")
    assert caching.lineage_cut_mode() == "local"  # unchanged by failures
    with caching.lineage_cut_scope("reliable", str(tmp_path / "cuts")):
        assert caching.lineage_cut_mode() == "reliable"
    assert caching.lineage_cut_mode() == "local"


def test_reliable_cut_stages_and_frees(spark, tmp_path):
    cuts = str(tmp_path / "cuts")
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    with caching.lineage_cut_scope("reliable", cuts):
        out = caching.tracked_local_checkpoint(df)
        path = out._ckpt_stage_path
        assert path.startswith(cuts) and os.path.exists(
            os.path.join(path, "_SUCCESS")
        )
        assert out.count() == 100
        assert [r["v"] for r in out.orderBy("id").limit(3).collect()] == [0, 2, 4]
        caching.free_local_checkpoint(out)
        assert not os.path.exists(path)


def test_reliable_cut_empty_frame_keeps_schema(spark, tmp_path):
    """An all-empty write produces no part files; the explicit-schema
    read-back must still return an empty frame with the right columns
    and types (schema inference over the empty dir would throw).
    Nullability relaxes — the documented parquet-round-trip behavior."""
    df = spark.range(5).withColumn("v", F.col("id") * 2).filter("id < 0")
    with caching.lineage_cut_scope("reliable", str(tmp_path / "cuts")):
        out = caching.tracked_local_checkpoint(df)
        assert out.count() == 0
        assert [(f.name, f.dataType) for f in out.schema.fields] == [
            (f.name, f.dataType) for f in df.schema.fields
        ]


def _pagerank_rows(spark, iters=6):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (6, 1), (7, 7)],
        "src long, dst long",
    )
    out = linkgraph.pagerank(edges, iterations=iters)
    return sorted(tuple(r) for r in out.collect())


def test_pagerank_bit_identical_across_modes(spark, tmp_path):
    local = _pagerank_rows(spark)
    with caching.lineage_cut_scope("reliable", str(tmp_path / "cuts")):
        reliable = _pagerank_rows(spark)
    assert reliable == local


def test_bpe_vocab_bit_identical_across_modes(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, "low lower lowest newer newest wide widest " * 3) for i in range(6)],
        "doc_id long, text string",
    )
    local = bpe.train_bpe(docs, "text", 10)
    with caching.lineage_cut_scope("reliable", str(tmp_path / "cuts")):
        reliable = bpe.train_bpe(docs, "text", 10)
    assert reliable == local


def test_pack_sequences_bit_identical_across_modes(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, (i * 37) % 23 + 1) for i in range(200)], "doc_id long, n int"
    )
    local = sorted(
        tuple(r)
        for r in packing.pack_sequences(
            docs, "doc_id", F.col("n"), seq_len=64, parts=8
        ).collect()
    )
    with caching.lineage_cut_scope("reliable", str(tmp_path / "cuts")):
        reliable = sorted(
            tuple(r)
            for r in packing.pack_sequences(
                docs, "doc_id", F.col("n"), seq_len=64, parts=8
            ).collect()
        )
    assert reliable == local


@pytest.mark.slow
def test_pipeline_end_to_end_bit_identical_across_modes(spark, tmp_path):
    """The whole 12-stage pipeline (exact dedup → near dedup → quality →
    decontamination → mix → pack) under `reliable` lineage cuts equals
    the `local` run bit-for-bit — ledger AND packed assignments. This is
    the composition test: every stage boundary and the prefix-sum pin
    inside pack_sequences route through the mode."""
    from basic_data_pipeline_spark.pipeline import prepare_training_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 50 == 0)

    def run():
        res = prepare_training_corpus(
            docs, min_quality=0.5, benchmark=bench,
            temperature=3.0, seq_len=256,
        )
        rows = sorted(
            tuple(r)
            for r in res.docs.select(
                "doc_id", "replica", "seq_bin", "bin_pos"
            ).collect()
        )
        return res.ledger, rows

    local_ledger, local_rows = run()
    with caching.lineage_cut_scope("reliable", str(tmp_path / "cuts")):
        rel_ledger, rel_rows = run()
    assert rel_ledger == local_ledger
    assert rel_rows == local_rows
