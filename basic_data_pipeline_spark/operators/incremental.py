"""Incremental near-dedup: new batches dedup against a persisted corpus
index instead of re-deduping the whole corpus (SURVEY.md §2.11 — the
workflow a 100 TB training-data pipeline actually runs: the corpus was
deduped once; every arriving increment is checked against the index and
only survivors join it).

The index holds two parquet tables per corpus:
  bands/     (doc_id, band, bandkey)  — the LSH join keys (O(docs × bands))
  shingles/  (doc_id, shingle)        — set-semantic word shingles, needed
                                        by the exact-Jaccard verify stage
                                        (O(corpus tokens); bucket by doc_id
                                        at scale so verify joins co-locate)

An increment of n docs costs: shingle+sign n docs, ONE banded equi-join
against the index bands (shuffle keyed on (band, bandkey) — never a scan
of corpus text), exact verify on the surfaced candidates only, and an
APPEND of the survivors' bands+shingles. Corpus text is never re-read.

Chain semantics: sequential batches apply greedy keep-lowest-id per
arrival. On transitive chains (a~b, b~c, a≁c) a full-corpus greedy drops
both b and c, while sequential processing keeps c if its only partner b
was already dropped — the standard behavior of every incremental dedup
(the index contains only SURVIVORS). Tests pin both facts.

Doc ids must be globally unique across the corpus and all increments
(they key the index), and new-batch ids must sort AFTER existing ids for
keep-lowest-id to mean keep-oldest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from basic_data_pipeline_spark.caching import tracked_persist
from basic_data_pipeline_spark.operators import dedup


def _p(index_path: str, name: str) -> str:
    return os.path.join(index_path, name)


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Self-dedup `docs` (LSH candidates → exact verify → greedy
    keep-lowest-id) and persist the SURVIVORS' bands + shingles as the
    corpus index. Returns the surviving docs."""
    sh = tracked_persist(dedup.word_shingles(docs, id_col, text_col))
    sig = dedup.minhash_signatures(sh, id_col)
    bands = tracked_persist(dedup.lsh_bands(sig, id_col))
    cand = dedup.lsh_candidate_pairs(bands, id_col)
    pairs = dedup.jaccard_verify(sh, cand, id_col, threshold)
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    survivors = docs.join(dropped, id_col, "left_anti")
    keep = survivors.select(id_col)
    bands.join(keep, id_col).write.mode("overwrite").parquet(
        _p(index_path, "bands")
    )
    sh.join(keep, id_col).write.mode("overwrite").parquet(
        _p(index_path, "shingles")
    )
    return survivors


def incremental_dedup(
    spark: SparkSession,
    new_docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_bucket: int | None = None,
    update_index: bool = True,
) -> DataFrame:
    """Dedup an increment against the index (and within itself), append
    the survivors to the index, return them.

    Cross candidates come from ONE equi-join of new bands × index bands
    on (band, bandkey); within-batch candidates from the banded self-join
    (optionally `max_bucket`-capped). Verify reads index shingles ONLY
    for candidate partners (join-pruned), never the whole corpus."""
    new_sh = tracked_persist(dedup.word_shingles(new_docs, id_col, text_col))
    new_sig = dedup.minhash_signatures(new_sh, id_col)
    new_bands = tracked_persist(dedup.lsh_bands(new_sig, id_col))

    idx_bands = spark.read.parquet(_p(index_path, "bands"))
    idx_sh = spark.read.parquet(_p(index_path, "shingles"))

    # cross pairs oriented (id_a = corpus survivor, id_b = new doc): the
    # corpus side always wins
    cross = (
        idx_bands.select(
            "band", "bandkey", F.col(id_col).alias("id_a")
        )
        .join(
            new_bands.select(
                "band", "bandkey", F.col(id_col).alias("id_b")
            ),
            on=["band", "bandkey"],
        )
        .select("id_a", "id_b")
        .distinct()
    )
    within = dedup.lsh_candidate_pairs(new_bands, id_col, max_bucket=max_bucket)
    cand = cross.unionByName(within)

    # verify needs both sides' shingles; the index side is pruned to
    # candidate partners before it ever shuffles
    old_ids = cand.select(F.col("id_a").alias(id_col)).distinct()
    verify_sh = new_sh.unionByName(idx_sh.join(old_ids, id_col, "left_semi"))
    pairs = dedup.jaccard_verify(verify_sh, cand, id_col, threshold)

    # MATERIALIZE the dropped ids before any index write: the lineage
    # above reads the index directories, and the returned survivors frame
    # outlives this call — left lazy, a post-append evaluation would see
    # the batch's own rows in the index and drop every survivor as its
    # own duplicate. The dropped set is bounded by the duplicates found
    # in ONE batch (not corpus size), so a driver round-trip is safe;
    # re-planting it as a DataFrame keeps the anti-join distributed.
    dropped_ids = [
        r[0] for r in pairs.select(F.col("id_b")).distinct().collect()
    ]
    dropped = spark.createDataFrame(
        [(i,) for i in dropped_ids] or [(None,)], f"{id_col} long"
    ).where(F.col(id_col).isNotNull())
    # only NEW docs can drop (cross pairs orient corpus-first; within
    # pairs are new×new) — anti-join filters survivors of this batch
    survivors = new_docs.join(dropped, id_col, "left_anti")

    if update_index:
        keep = survivors.select(id_col)
        new_bands.join(keep, id_col).write.mode("append").parquet(
            _p(index_path, "bands")
        )
        new_sh.join(keep, id_col).write.mode("append").parquet(
            _p(index_path, "shingles")
        )
    return survivors
