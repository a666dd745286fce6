"""One-call training-corpus preparation: the end-to-end pipeline a user
of this engine runs between "raw crawl" and "tokenizer input".

Chains the package's operators in the order production corpora use them,
with per-stage row accounting so a run is auditable:

    exact dedup → near dedup (LSH+verify) → quality filter →
    repetition filter → benchmark decontamination →
    mixing (temperature or explicit) → [deterministic shuffle] →
    sequence packing

Every stage is one of the already-tested operators (dedup.py, text.py,
packing.py, sampling.py); this module adds only the composition and the
accounting. All stages are deterministic (hash-based sampling, md5/xxhash
families), so the same inputs produce the same corpus on any cluster,
any partitioning, any retry — the property that makes training runs
reproducible.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import dedup, packing, sampling, text


@dataclass
class CorpusPrepResult:
    """Surviving docs (with `seq_bin`/`bin_pos` packing assignments) plus
    the per-stage row ledger."""

    docs: DataFrame
    ledger: dict[str, int] = field(default_factory=dict)


def prepare_training_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    near_dup_threshold: float = 0.5,
    min_quality: float = 0.5,
    max_repetition: float | None = None,
    min_lm_score: float | None = None,
    benchmark: DataFrame | None = None,
    contamination_ngram: int = 8,
    mix: dict[str, float] | None = None,
    mix_col: str = "source",
    temperature: float | None = None,
    shuffle_salt: str | None = None,
    seq_len: int = 2048,
) -> CorpusPrepResult:
    """Run the full prep pipeline; see module docstring for the stages.

    `mix` (explicit per-source fractions, may upsample) and `temperature`
    ((n_i/N)^(1/T) rebalancing) are mutually exclusive; neither skips
    mixing entirely. `max_repetition` (when set) drops documents whose
    duplicate-bigram fraction exceeds it (repetition_profile — the
    MassiveText boilerplate filter; docs too short to have bigrams are
    kept). `min_lm_score` (when set) additionally drops documents whose
    corpus-self-trained bigram LM score (mean log2 P(w_i|w_{i-1}),
    text.bigram_lm_scores) falls below the floor — docs with no bigrams
    are kept, mirroring `max_repetition`. `shuffle_salt` (when set) packs documents in DETERMINISTIC
    SHUFFLED order — the pack key becomes md5(salt || id), so the packing
    order is a reproducible pseudo-random permutation (same salt → same
    corpus layout on any cluster/partitioning; different salt → a fresh
    shuffle for another epoch) instead of id order. The ledger counts
    rows AFTER each stage; each stage's result is persisted before its
    count so the ledger costs one pass per stage instead of re-executing
    the whole upstream lineage per count (O(stages) not O(stages²));
    intermediates are released at return, the final result stays
    persisted for the caller's first action."""
    if mix is not None and temperature is not None:
        raise ValueError("pass either mix= or temperature=, not both")
    held: list[DataFrame] = []

    def stage(df: DataFrame) -> DataFrame:
        df = df.persist()
        held.append(df)
        return df

    ledger = {"input": docs.count()}

    # 1. exact dedup under the canonical fingerprint (formatting-proof)
    survivors = dedup.exact_dedup_survivors(
        docs, id_col, text.fingerprint(F.col(text_col))
    ).select(id_col)
    d = stage(docs.join(survivors, id_col, "left_semi"))
    ledger["exact_dedup"] = d.count()

    # 2. near dedup: LSH candidates → exact verify → cluster survivors
    d = stage(
        dedup.near_dedup_corpus(d, id_col, text_col, threshold=near_dup_threshold)
    )
    ledger["near_dedup"] = d.count()

    # 3. quality floor (C4-style flags → mean score in [0, 1])
    d = stage(d.filter(text.quality_score(F.col(text_col)) >= min_quality))
    ledger["quality"] = d.count()

    # 3a. LM-score floor: corpus-self-trained bigram perplexity signal —
    # drops word-salad/outlier docs the flag-based score can't see. The
    # LM trains on the CURRENT survivors (post-dedup), so duplicated
    # boilerplate can no longer inflate its own probability.
    if min_lm_score is not None:
        lm = text.bigram_lm_scores(d, id_col, text_col)
        too_surprising = lm.filter(
            F.col("lm_score") < min_lm_score
        ).select(id_col)
        d = stage(d.join(too_surprising, id_col, "left_anti"))
        ledger["lm_floor"] = d.count()

    # 3b. repetition ceiling (duplicate-bigram fraction — boilerplate)
    if max_repetition is not None:
        reps = text.repetition_profile(d, id_col, text_col, ns=(2,))
        too_repetitive = reps.filter(
            F.col("dup_ngram_frac") > max_repetition
        ).select(id_col)
        d = stage(d.join(too_repetitive, id_col, "left_anti"))
        ledger["repetition"] = d.count()

    # 4. benchmark decontamination (drop docs sharing an n-gram)
    if benchmark is not None:
        hits = packing.contamination_hits(
            d, benchmark, id_col, text_col, contamination_ngram
        )
        d = stage(d.join(hits.select(id_col), id_col, "left_anti"))
        ledger["decontaminated"] = d.count()

    # 5. mixing
    if temperature is not None:
        d = stage(sampling.temperature_mix(d, mix_col, temperature, id_col=id_col))
        ledger["mixed"] = d.count()
    elif mix is not None:
        d = stage(sampling.weighted_mix(d, mix_col, mix, id_col=id_col))
        ledger["mixed"] = d.count()

    # 6. sequence packing assignments (replicas get distinct pack ids so
    # upsampled copies land in different windows)
    pack_id = (
        F.concat_ws("#", F.col(id_col).cast("string"), F.col("replica"))
        if "replica" in d.columns
        else F.col(id_col).cast("string")
    )
    if shuffle_salt is not None:
        # deterministic shuffle: the pack key IS the packing order, so a
        # salted md5 key packs the corpus in a reproducible pseudo-random
        # permutation — no extra operator, the prefix sum's range
        # partitioning distributes the hash order exactly like id order.
        pack_id = F.md5(F.concat(F.lit(shuffle_salt), F.lit("|"), pack_id))
    d = d.withColumn("_pack_id", pack_id)
    packed = packing.pack_sequences(
        d, "_pack_id", text.n_tokens(F.col(text_col)), seq_len
    )
    out = d.join(packed.select("_pack_id", "seq_bin", "bin_pos"), "_pack_id").drop(
        "_pack_id"
    ).persist()
    ledger["packed"] = out.count()
    for h in held:
        h.unpersist()
    return CorpusPrepResult(docs=out, ledger=ledger)
