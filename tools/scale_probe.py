"""16× scale probe: replicate the sf0.1 fixtures into a synthetic ~sf1.6
directory (every key column shifted per copy, so each copy is a
self-contained shard — joins and groupings stay consistent within a copy
and cardinalities grow 16×), then time the headline queries on both.

    python tools/scale_probe.py                # all headline queries
    python tools/scale_probe.py window_ dedup  # substring filters

Prints one line per query: name, sf0.1 seconds, 16× seconds, ratio. A
ratio well above ~16/parallel-headroom flags a super-linear operator —
how `dedup_ngram_jaccard`'s quadratic inverted-index join was caught in
round 1 (SCALING.md). Results are recorded in SCALING.md, not asserted:
the probe is a measurement harness, not a pass/fail gate.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from basic_data_pipeline_spark import get_spark
from basic_data_pipeline_spark.catalog import TABLES, load_table
from basic_data_pipeline_spark.registry import headline_queries

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_PROBE_COPIES", "16"))
SHIFT = 1_000_000_000  # key offset per copy; far above any fixture key

# SPARK_GRAFT_PROBE_PERTURB=1 → every TOKEN of documents.text gets a
# per-copy prefix, so copies share NO shingles/grams/lines: the replica
# grows like an honest corpus (same per-shard duplicate rate, nothing
# cross-copy) instead of the adversarial all-copies-identical case. Use
# it to measure the dedup operators' own scaling — the default
# (unperturbed) measures their worst case, where the OUTPUT (duplicate
# pairs / removed spans) itself explodes with the copy count and wall
# ratios conflate the two (r7 verdict: dedup_exact_fp 16× "ratio 6.5
# (adversarial)"). Both dirs coexist.
PERTURB = os.environ.get("SPARK_GRAFT_PROBE_PERTURB", "") == "1"
PROBE_DIR = os.environ.get(
    "SPARK_GRAFT_PROBE_DIR",
    "/tmp/spark_graft_sf16x" + ("_perturbed" if PERTURB else ""),
)

# Columns that identify/join rows — shifted per copy so every copy is a
# closed shard (orders.o_custkey still finds its customer, events keep
# their per-user ordering, LSH pairs stay within-copy only if content
# differs — content columns are NOT perturbed by default, so dedup
# queries see every bucket 16× hot: the adversarial case; see PERTURB).
KEYish = ("key", "_id", "id")


def _is_key(col: str) -> bool:
    return col.endswith(KEYish) or col in ("user_id",)


REUSE = os.environ.get("SPARK_GRAFT_PROBE_REUSE", "") == "1"


def build_probe_dir(spark) -> None:
    if os.path.isdir(PROBE_DIR):
        if REUSE:  # an existing replica dir is deterministic — reusable
            return
        shutil.rmtree(PROBE_DIR)
    copies = spark.range(COPIES).select(F.col("id").alias("_copy"))
    for name in TABLES:
        df = load_table(spark, BASE, name)
        rep = df.crossJoin(copies)
        for c, t in df.dtypes:
            if _is_key(c) and t in ("bigint", "int", "long"):
                rep = rep.withColumn(c, F.col(c) + F.col("_copy") * SHIFT)
        if PERTURB and name == "documents":
            # per-copy token prefix: within-copy duplicate structure is
            # preserved exactly; across copies nothing matches
            rep = rep.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda x: F.concat(
                            F.lit("c"), F.col("_copy").cast("string"),
                            F.lit("_"), x,
                        ),
                    ),
                    " ",
                ),
            )
        if PERTURB and name == "embeddings":
            # per-copy random TRANSLATION (one hash-derived offset
            # vector per copy, the same for every vector in the copy):
            # within-copy geometry — every pairwise distance and cosine
            # structure — is preserved exactly, but the offset's
            # components are ±0.2 uniform (the fixture's unit vectors
            # have component sd 0.125), so hyperplane projections move
            # by ~1 sd and copies land in fresh cells. Without this,
            # every copy of a vector carries an IDENTICAL signature in
            # every LSH/IVF table (resolution can only split vectors
            # that differ) and the candidate pair space grows ∝ copies²
            # (adversarial, r8-close finding on sim_ann_lsh). A weaker
            # constant shift along the all-ones direction was tried and
            # rejected: it moves projections by c·Σplane_j, which is
            # ≪ 1 sd for small copy indices, leaving most copies exact
            # colliders. Same honest-vs-adversarial split the token
            # prefix gives the dedup family.
            rep = rep.withColumn(
                "embedding",
                F.transform(
                    F.col("embedding"),
                    lambda x, i: (
                        x.cast("double")
                        + (
                            F.pmod(
                                F.xxhash64(F.col("_copy"), i), F.lit(1000)
                            ).cast("double")
                            / 1000.0
                            - 0.5
                        )
                        * 0.4
                    ).cast("float"),  # keep the fixture's FLOAT[] schema
                ),
            )
        rep.drop("_copy").write.mode("overwrite").parquet(
            f"{PROBE_DIR}/{name}.parquet"
        )


# --- direct operator probes (round-5 surface without a headline query) ---
# Each is (spark, sf_dir) -> DataFrame like a registry query, built on the
# probe fixtures so the 16x replication exercises the operator's own
# shuffle/join geometry, not a merged query's.


def _probe_pack_sequences(spark, d):
    from basic_data_pipeline_spark.operators import packing, text

    docs = load_table(spark, d, "documents")
    return packing.pack_sequences(docs, "doc_id", text.n_tokens(F.col("text")), 256)


def _probe_pack_token_windows(spark, d):
    from basic_data_pipeline_spark.operators import packing

    docs = load_table(spark, d, "documents")
    return packing.pack_token_windows(docs, "doc_id", "text", 256)


def _probe_contamination_hits(spark, d):
    from basic_data_pipeline_spark.operators import packing

    docs = load_table(spark, d, "documents")
    # SHIFT is divisible by 50, so the benchmark fraction survives the
    # per-copy id shift.
    return packing.contamination_hits(
        docs, docs.filter(F.col("doc_id") % 50 == 0), "doc_id", "text", 8
    )


def _probe_lr_train(spark, d):
    from basic_data_pipeline_spark.operators import classifier, text

    # weak label from the heuristic score (the real workflow: heuristic
    # seeds → trained model); 8 GD iterations, one agg job each
    docs = load_table(spark, d, "documents").withColumn(
        "label", (text.quality_score(F.col("text")) >= 0.5).cast("int")
    )
    m = classifier.train_quality_lr(docs, "label", n_iters=8)
    return spark.createDataFrame(
        [tuple(m.weights) + (m.bias,)],
        ", ".join(f"w{j} double" for j in range(len(m.weights)))
        + ", bias double",
    )


def _probe_substring_dedup(spark, d):
    from basic_data_pipeline_spark.operators import substring

    # ADVERSARIAL at 16x: content is NOT perturbed by the copier, so every
    # gram in every doc is 16x-hot and all but the first copy's tokens are
    # removed — the maximal-removal case (covered set ~ the whole corpus).
    docs = load_table(spark, d, "documents")
    return substring.substring_dedup_corpus(docs, "doc_id", "text", 8)


def _probe_ivfpq_search(spark, d):
    from basic_data_pipeline_spark.operators import similarity

    emb = load_table(spark, d, "embeddings")
    # Production IVF scales nlist with the corpus (fixed cell occupancy,
    # here ~50): a fixed cell count would make self-search cost n^2/cells
    # — super-linear by design, not an implementation property. The coarse
    # seed is a hash block ∝ n; one Lloyd iteration fits cells to data.
    n_cells = max(8, emb.count() // 50)
    blocked = emb.withColumn(
        "blk", F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_cells))
    )
    return similarity.ivfpq_search(
        blocked, dim=64, k=3, train_by="blk", nprobe=2, train_iters=1,
        shortlist=20,
    )


def _probe_scd2_apply(spark, d):
    from basic_data_pipeline_spark.operators.scd import scd2_apply

    o = load_table(spark, d, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
        (F.col("o_orderkey") % 97).cast("long").alias("ts"),
        F.when(F.col("o_orderkey") % 17 == 0, F.lit("d"))
        .otherwise(F.lit("u"))
        .alias("op"),
    )
    b2 = o.withColumn("ts", F.col("ts") + 100).withColumn(
        "price", F.col("price") * 1.1
    )
    return scd2_apply(scd2_apply(None, o, ["id"]), b2, ["id"])


def _probe_cms(spark, d):
    from basic_data_pipeline_spark.operators import sketches

    ev = load_table(spark, d, "events")
    half = ev.filter(F.col("user_id") % 2 == 0)
    other = ev.filter(F.col("user_id") % 2 != 0)
    return sketches.cms_merge(
        sketches.cms_build(half, "event_type"),
        sketches.cms_build(other, "event_type"),
    )


def _probe_bigram_lm(spark, d):
    from basic_data_pipeline_spark.operators import text

    return text.bigram_lm_scores(load_table(spark, d, "documents"))


def _probe_binned_range_join(spark, d):
    from basic_data_pipeline_spark.operators.rangejoin import binned_range_join

    # value/price are CONTENT columns (not key-shifted), so the 16x copies
    # cross-match: the match count grows ~256x, the adversarial hot-bin
    # case we want. The %25/%500 filters (SHIFT-divisible) bound the
    # output so the probe measures join throughput, not sink volume.
    pts = (
        load_table(spark, d, "events")
        .filter(F.col("event_id") % 25 == 0)
        .select(F.col("event_id").alias("pid"), F.col("value").alias("p"))
    )
    iv = (
        load_table(spark, d, "orders")
        .filter(F.col("o_orderkey") % 500 == 0)
        .select(
            F.col("o_orderkey").alias("iid"),
            (F.col("o_totalprice") % 80).alias("lo"),
            (F.col("o_totalprice") % 80 + F.col("o_orderkey") % 7).alias("hi"),
        )
    )
    return binned_range_join(pts, iv, "p", "lo", "hi", bin_width=8.0)


def _probe_repetition_profile(spark, d):
    from basic_data_pipeline_spark.operators import text

    return text.repetition_profile(load_table(spark, d, "documents"))


def _probe_chunk_documents(spark, d):
    from basic_data_pipeline_spark.operators import packing

    return packing.chunk_documents(
        load_table(spark, d, "documents"), "doc_id", "text", 32, 8
    )


def _probe_tfidf_top_terms(spark, d):
    from basic_data_pipeline_spark.operators import text

    return text.tfidf_top_terms(load_table(spark, d, "documents"), k=5)


def _probe_negative_samples(spark, d):
    from basic_data_pipeline_spark.operators import sampling

    return sampling.negative_samples(
        load_table(spark, d, "documents"), "doc_id", k=4, salt="probe"
    )


def _probe_sessionize_stats(spark, d):
    from basic_data_pipeline_spark.operators import sessions

    return sessions.session_stats(
        sessions.sessionize(load_table(spark, d, "events"), gap_seconds=14400.0)
    )


def _probe_line_dedup(spark, d):
    from basic_data_pipeline_spark.operators import dedup

    # content columns are NOT perturbed by the copier, so every line's
    # doc-frequency is 16× hot — the adversarial case for the stats join
    segs = dedup.segment_word_lines(
        load_table(spark, d, "documents"), "doc_id", "text", 8
    )
    return dedup.reassemble_lines(
        dedup.dedup_lines(segs, "doc_id", "drop_common", 2), "doc_id", " "
    )


def _probe_ann_lsh_auto(spark, d):
    from basic_data_pipeline_spark.operators import similarity

    # auto resolution: the pair space should stay ~linear in n because
    # planes grow with log2(n) (fixed-resolution LSH would be ~256×).
    # NOTE: on the UNPERTURBED replica every copy of a vector is an
    # exact duplicate — identical signatures defeat resolution and the
    # pair space grows ∝ copies² (adversarial tier); use PERTURB=1 for
    # the honest tier, or op_ann_lsh_capped for the defensive bound.
    return similarity.ann_topk_lsh(
        load_table(spark, d, "embeddings"), dim=64, k=3, n_planes=None
    )


def _probe_ann_lsh_capped(spark, d):
    from basic_data_pipeline_spark.operators import similarity

    # the duplicate-pile-up bound: 10× the auto-resolution target
    # occupancy — never binds on honest cells, cuts exact-duplicate
    # cells the planes cannot split (r8-close sim_ann_lsh finding)
    return similarity.ann_topk_lsh(
        load_table(spark, d, "embeddings"),
        dim=64, k=3, n_planes=None, max_bucket_df=940,
    )


def _probe_pipeline_e2e(spark, d):
    """The 12-stage one-call pipeline (r9 item #2): every stage is
    probed solo elsewhere; this measures the COMPOSITION — persist
    chains, ledger counts, driver-heap pressure at the tail. Prints the
    per-stage ledger + wall table to stderr (the SCALING.md rows)."""
    import sys as _sys

    from basic_data_pipeline_spark import pipeline as P

    docs = load_table(spark, d, "documents")
    n = docs.count()
    # NOTE: c4_clean deliberately OFF — the fixture's documents are
    # single-line without terminal punctuation, so the C4 line rules
    # (≥3 kept lines, terminal '.') legitimately drop the whole corpus
    # and the probe would measure 11 stages of empty frames (the r9
    # first run did exactly that, and incidentally exposed the
    # empty-corpus crash in weighted_mix's map construction).
    res = P.prepare_training_corpus(
        docs,
        domain_col="source",
        max_per_domain=1_000_000_000,  # never binds: pays the window, keeps the pool
        near_dup_threshold=0.5,
        substring_k=25,
        min_quality=0.3,
        max_repetition=0.95,
        min_lm_score=-30.0,
        benchmark=docs.filter(F.col("doc_id") % 97 == 0).select(
            "doc_id", "text"
        ),
        contamination_ngram=12,
        dsir_target=docs.filter(F.col("doc_id") % 50 == 0).select(
            "doc_id", "text"
        ),
        dsir_k=max(1, int(n * 0.3)),
        temperature=0.7,
        shuffle_salt="probe",
        seq_len=2048,
    )
    print(
        f"pipeline_e2e[{d}] ledger={res.ledger} walls={res.walls}",
        file=_sys.stderr,
    )
    return res.docs


def _probe_ann_lsh_codeattach(spark, d):
    from basic_data_pipeline_spark.operators import similarity

    # the beyond-broadcast-ceiling path, FORCED (r9 item #1): SQ8 code
    # attach -> k·4 shortlist -> exact rerank. At the 256× honest
    # (PERTURB=1) tier this is the configuration whose r8 ancestor (wide
    # raw-vector shuffle join) filled the disk and died; the width-safe
    # path must complete in the linear envelope with broadcast OFF.
    return similarity.ann_topk_lsh(
        load_table(spark, d, "embeddings"),
        dim=64, k=3, n_planes=None, broadcast_vectors=False,
    )


def _probe_quality_profile(spark, d):
    from basic_data_pipeline_spark.operators import quality

    # approx distinct (the at-scale default); lineitem = the widest/biggest
    # fixture, every column profiled in ONE aggregation
    return quality.profile_columns(load_table(spark, d, "lineitem"))


def _probe_quality_checks(spark, d):
    from basic_data_pipeline_spark.operators import quality as Q

    li = load_table(spark, d, "lineitem")
    return Q.check_constraints(
        li,
        [
            Q.not_null("ok_orderkey", "l_orderkey"),
            Q.unique("pk", "l_orderkey", "l_linenumber"),
            Q.in_range("qty", "l_quantity", 0, 100),
            Q.condition("disc", F.col("l_discount") <= 0.1, 0.9),
        ],
    )


def _probe_table_diff(spark, d):
    from basic_data_pipeline_spark.operators import quality

    o = load_table(spark, d, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    old = o.filter(F.col("o_orderkey") % 7 != 0)
    new = o.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 11 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    )
    return quality.table_diff(old, new, ["o_orderkey"])


def _probe_psi_drift(spark, d):
    from basic_data_pipeline_spark.operators import quality

    docs = load_table(spark, d, "documents")
    return quality.psi_drift(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "n_chars", 0.0, 600.0, bins=12,
    )


def _probe_bpe_train(spark, d):
    from basic_data_pipeline_spark.operators import bpe

    # 5 merge rounds: round cost is VOCAB-sized after the one corpus-sized
    # word count — content is not perturbed by the copier, so the 16x run
    # has the same vocabulary with 16x the weight: ratio isolates the
    # corpus-sized stage.
    docs = load_table(spark, d, "documents")
    return bpe.merges_df(spark, bpe.train_bpe(docs, "text", 5))


def _probe_bpe_encode(spark, d):
    from basic_data_pipeline_spark.operators import bpe

    docs = load_table(spark, d, "documents")
    merges = bpe.train_bpe(docs.limit(200), "text", 3)
    return bpe.encode_bpe(docs, merges, "doc_id", "text")


def _probe_random_projection(spark, d):
    from basic_data_pipeline_spark.operators import embeddings

    return embeddings.random_projection(
        load_table(spark, d, "embeddings"), "vec_id", "embedding", 64, 16
    )


def _probe_pca_fit_project(spark, d):
    from basic_data_pipeline_spark.operators import embeddings

    e = load_table(spark, d, "embeddings")
    model = embeddings.pca_fit(e, "embedding", 64, 16)
    return embeddings.pca_project(e, "vec_id", "embedding", model)


def _probe_fuzzy_pairs(spark, d):
    from basic_data_pipeline_spark.operators import entity

    # ADVERSARIAL: the copier shifts keys but NOT name content, so every
    # name repeats 16x — dist-0 pairs grow ~C(16,2)x and near pairs
    # ~256x. A 2000-name slice (per copy) keeps the blow-up measurable
    # without drowning the probe in the quadratic-by-construction output.
    c = (
        load_table(spark, d, "customer")
        .filter(F.pmod(F.col("c_custkey"), F.lit(SHIFT)) < 2000)
        .select(F.col("c_custkey").alias("id"), F.col("c_name").alias("name"))
    )
    return entity.fuzzy_pairs(c, "id", "name", max_edit=1)


def _probe_heavy_hitters(spark, d):
    from basic_data_pipeline_spark.operators import sketches

    toks = (
        load_table(spark, d, "documents")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
    )
    return sketches.heavy_hitters(toks, "w", 50)


def _probe_near_dedup_quality(spark, d):
    from basic_data_pipeline_spark.operators import dedup

    # full pipeline incl. connected components + per-cluster argmax —
    # content unperturbed: every duplicate cluster is 16x hot
    docs = load_table(spark, d, "documents")
    return dedup.near_dedup_corpus(
        docs, survivor_policy="quality", quality_col="n_chars"
    )


def _probe_domain_cap(spark, d):
    from basic_data_pipeline_spark.operators import domains

    # source column is NOT key-shifted, so the 16x replica concentrates
    # 16x docs into the SAME 20 domains — exactly the hot-domain case
    # the salted two-phase window exists for. cap=100 keeps 2000 rows at
    # every scale, so wall growth is the operator's, not the output's.
    docs = load_table(spark, d, "documents")
    return domains.domain_cap_ranked(docs, "source", 100)


def _probe_dsir_resample(spark, d):
    from basic_data_pipeline_spark.operators import selection

    # target = the benchmark slice (doc_id % 50 == 0 pre-shift; the
    # copier shifts doc_id by 1e9 per copy, and 1e9 % 50 == 0, so the
    # slice stays 2% of every copy). k fixed at 500: output is constant,
    # wall growth is the fit + weight passes' — both linear shuffles
    # plus the O(n_buckets) broadcast model.
    docs = load_table(spark, d, "documents")
    return selection.importance_resample(
        docs, docs.filter(F.col("doc_id") % 50 == 0),
        "doc_id", "text", k=500,
    )


def _probe_bm25_topk(spark, d):
    from basic_data_pipeline_spark.operators import retrieval

    # 100 copy-0 query docs at every scale (fixed query batch, constant
    # output), corpus = the whole replica. Content is NOT perturbed, so
    # the vocabulary stays fixed and every query term's postings list
    # grows 16× — candidates ∝ n for a fixed query set, the honest
    # retrieval workload. Wall growth isolates the corpus-side stages:
    # postings build, df agg, and the pruned scoring join.
    docs = load_table(spark, d, "documents")
    qs = docs.filter(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    return retrieval.bm25_topk(docs, qs, 10, max_df_frac=0.5)


def _probe_token_budget_mix(spark, d):
    from basic_data_pipeline_spark.operators import sampling, text

    # budgets scale WITH the replica (×16 when the corpus is ×16) so
    # the kept fraction is constant and the probe measures the
    # group-generalized prefix sum, not a shrinking output.
    docs = load_table(spark, d, "documents")
    scale = 1 if d == BASE else COPIES
    budgets = {f"src{i}": 4_000 * scale for i in range(20)}
    return sampling.token_budget_mix(
        docs, budgets, text.n_tokens(F.col("text"))
    ).select("doc_id")


def _probe_phrase_blocklist(spark, d):
    from basic_data_pipeline_spark.operators import domains

    # blocklist derived from copy-0 docs (first 3 tokens of every
    # doc_id % 97 == 0 doc + first token of every % 89 == 0 doc — the
    # text_lang_token[blockphrase] recipe), so the list is IDENTICAL at
    # both scales while the corpus side grows: wall growth isolates the
    # per-length gram explode + broadcast join + candidate-only count.
    docs = load_table(spark, d, "documents")
    base = load_table(spark, BASE, "documents")
    w = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: F.length(t) > 0
    )
    ph = (
        base.filter(F.col("doc_id") % 97 == 0)
        .select(F.concat_ws(" ", F.slice(w, 1, 3)).alias("phrase"))
        .unionByName(
            base.filter(F.col("doc_id") % 89 == 0)
            .select(F.concat_ws(" ", F.slice(w, 1, 1)).alias("phrase"))
        )
    )
    return domains.phrase_blocklist_hits(docs, ph, "doc_id", "text")


def _probe_leakage_splits(spark, d):
    from basic_data_pipeline_spark.operators import dedup, sampling

    # pairs via the PRODUCTION near-dup path (LSH candidates → verify),
    # then component labeling + cluster-atomic split assignment. The
    # replica's unperturbed copies make every band bucket 16×-hot
    # (adversarial, like every dedup probe) and the pair set grows with
    # the duplicate structure — the probe measures clustering + split
    # over that growth. Returns the train slice's ids.
    docs = load_table(spark, d, "documents")
    sh = dedup.word_shingles(docs, "doc_id", "text", 3)
    cand = dedup.lsh_candidate_pairs(
        dedup.lsh_bands(dedup.minhash_signatures(sh, "doc_id"), "doc_id"),
        "doc_id",
    )
    pairs = dedup.jaccard_verify(sh, cand, "doc_id", 0.5)
    splits = sampling.leakage_safe_splits(
        docs, pairs, {"train": 0.8, "test": 0.2}
    )
    return splits["train"].select("doc_id")


def _probe_c4_gopher_profile(spark, d):
    from basic_data_pipeline_spark.operators import text

    # Both r8-close text batteries in ONE projection (the composition
    # they are designed for), aggregated to a constant-size output so
    # wall growth is the projection's, not the writeback's. Zero
    # shuffles before the final 2-row agg — expect ~linear/flat.
    docs = load_table(spark, d, "documents")
    c4 = text.c4_line_clean(F.col("text"))
    g = text.gopher_quality_flags(F.col("text"))
    return docs.select(
        c4["n_kept"].alias("nk"),
        c4["keep_doc"].cast("int").alias("kd"),
        text.gopher_rule_mask(F.col("text")).alias("mask"),
        g["alpha_word_ratio"].alias("ar"),
    ).agg(
        F.sum("nk"), F.sum("kd"), F.sum("mask"), F.avg("ar")
    )


def _probe_score_buckets(spark, d):
    from basic_data_pipeline_spark.operators import selection, text

    # per-language NTILE over a cheap codegen score: ONE window shuffle
    # on lang (5 groups at every scale — the skew-concentration case);
    # output aggregated to (lang × 3) rows so growth is the sort's.
    docs = load_table(spark, d, "documents")
    scored = docs.select(
        "doc_id", "lang", text.quality_score(F.col("text")).alias("s")
    )
    return (
        selection.score_buckets(scored, "s", "lang", "doc_id")
        .groupBy("lang", "bucket")
        .agg(F.count("*").alias("n"))
    )


def _probe_sq8_search(spark, d):
    from basic_data_pipeline_spark.operators import embeddings

    # fit + encode + ADC top-10 for 100 copy-0 queries against the whole
    # replica: fixed query batch, constant output — wall growth is the
    # fit agg (n·dim rows, map-side min/max partials) + the linear
    # decode/score scan, both expected ~linear.
    vecs = load_table(spark, d, "embeddings")
    model = embeddings.sq8_fit(vecs)
    return embeddings.sq8_search(
        vecs.filter(F.col("vec_id") < 100),
        embeddings.sq8_encode(vecs, model),
        model,
        10,
    )


def _probe_winnow_overlap(spark, d):
    from basic_data_pipeline_spark.operators import dedup

    # fingerprints + capped overlap report. Unperturbed replica =
    # adversarial: every fingerprint is 16x-hot, so max_fp_df bounds
    # the join the way it exists to (without the cap the pair space is
    # the 16x-clique quadratic, the same class as every dedup probe's
    # worst case). Output: pairs among docs sharing >= 3 capped fps.
    docs = load_table(spark, d, "documents")
    fps = dedup.winnow_fingerprints(docs, "doc_id", "text", 3, 4)
    return dedup.winnow_overlap_pairs(
        fps, "doc_id", 3, max_fp_df=40
    ).groupBy().agg(F.count("*").alias("n_pairs"))


def _probe_gapfill(spark, d):
    from basic_data_pipeline_spark.operators import timeseries as TS

    # hourly per-user mean series over the whole replica, densified +
    # linearly interpolated. user_id is key-shifted, so the 16x replica
    # has 16x keys over the same 720-bucket month: the dense grid (=
    # the output) grows 16x, and the probe measures the sequence
    # explode + grid join + two-frame window at output-linear volume
    # (noop sink — no writeback cost).
    ev = load_table(spark, d, "events")
    hb = ev.groupBy(
        "user_id", TS.time_bucket(F.col("ts"), 3600).alias("b")
    ).agg(F.avg("value").alias("v"))
    return TS.gapfill(hb, "user_id", "b", "v", 3600, "linear")


def _probe_image_near_dup(spark, d):
    from basic_data_pipeline_spark.operators import images as IM

    # real PNG render -> decode -> perceptual hash -> banded Hamming
    # join, at the PRODUCTION configuration: budget 3 (16-bit bands)
    # with the hot-bucket cap. The first version of this probe ran
    # budget 8 uncapped (7-bit bands): fine at 16x (35 s), TIMED OUT at
    # 64x -- Sigma df^2 grew 252x over the 16x corpus because 128-value
    # bands make occupancy Theta(n/128) and the join Theta(n^2). See
    # images.image_near_dup_pairs' size rule and SCALING.md round-8.
    docs = load_table(spark, d, "documents")
    corpus = IM.synth_images(docs, group_size=4, size=32, noise_px=3)
    hashes = IM.image_hashes(corpus)
    return IM.image_near_dup_pairs(
        hashes, max_hamming=3, max_band_df=1000
    ).groupBy().agg(F.count("*").alias("n_pairs"))


def _probe_audio_match(spark, d):
    from basic_data_pipeline_spark.operators import audio as AU

    # real WAV render -> stdlib PCM decode -> numpy FFT constellation ->
    # hash join + offset vote. Same cost profile as the image probe:
    # the Python DSP stage dominates and is shuffle-free; the match join
    # is JVM-side with the max_hash_df boilerplate cut.
    docs = load_table(spark, d, "documents")
    corpus = AU.synth_audio(docs, group_size=4, seconds=1.0, rate=8000)
    fps = AU.audio_fingerprints(corpus)
    return AU.audio_match_pairs(fps, min_votes=8).groupBy().agg(
        F.count("*").alias("n_pairs")
    )


def _probe_pagerank(spark, d):
    from basic_data_pipeline_spark.operators import linkgraph

    # the text_lang_token pagerank arm's synthetic crawl graph at probe
    # scale: nodes = docs, 3 modular out-links each, ~6% dangling; the
    # probe measures the ITERATION geometry (cached src-partitioned
    # edges, node-sized per-round shuffle) as the graph grows.
    # The replica's ids are copy-shifted (doc_id + copy*SHIFT), so the
    # modular targets are computed WITHIN the copy (dense 0..base_n-1
    # there) and re-shifted — each copy is a closed subgraph, the same
    # convention every other probe uses for joins.
    docs = load_table(spark, d, "documents").select("doc_id")
    base_n = docs.select(
        F.countDistinct(F.col("doc_id") % SHIFT).alias("n")
    ).collect()[0]["n"]
    edges = (
        docs.filter(F.col("doc_id") % SHIFT % 17 != 0)
        .select(
            "doc_id",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("_j"),
        )
        .select(
            F.col("doc_id").alias("src"),
            (
                (F.col("doc_id") - F.col("doc_id") % SHIFT)
                + F.expr(f"((doc_id % {SHIFT}) * 31 + _j * 17) % {base_n}")
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return linkgraph.pagerank(
        edges, nodes=docs.withColumnRenamed("doc_id", "node"), iterations=5
    )


def _probe_hits(spark, d):
    from basic_data_pipeline_spark.operators import linkgraph

    # same synthetic closed-subgraph-per-copy graph as op_pagerank; HITS
    # doubles the join count (two persisted edge layouts, two
    # half-steps per round) — the probe checks the doubling stays a
    # constant factor as the graph grows
    docs = load_table(spark, d, "documents").select("doc_id")
    base_n = docs.select(
        F.countDistinct(F.col("doc_id") % SHIFT).alias("n")
    ).collect()[0]["n"]
    edges = (
        docs.filter(F.col("doc_id") % SHIFT % 17 != 0)
        .select(
            "doc_id",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("_j"),
        )
        .select(
            F.col("doc_id").alias("src"),
            (
                (F.col("doc_id") - F.col("doc_id") % SHIFT)
                + F.expr(f"((doc_id % {SHIFT}) * 31 + _j * 17) % {base_n}")
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return linkgraph.hits(
        edges, nodes=docs.withColumnRenamed("doc_id", "node"), iterations=5
    )


def _synthetic_copy_graph(spark, d):
    """The pagerank-arm synthetic crawl graph at probe scale: each copy
    is a closed subgraph (modular targets computed within the copy,
    re-shifted) — shared by the pagerank/hits/scc/lpa probes."""
    docs = load_table(spark, d, "documents").select("doc_id")
    base_n = docs.select(
        F.countDistinct(F.col("doc_id") % SHIFT).alias("n")
    ).collect()[0]["n"]
    edges = (
        docs.filter(F.col("doc_id") % SHIFT % 17 != 0)
        .select(
            "doc_id",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("_j"),
        )
        .select(
            F.col("doc_id").alias("src"),
            (
                (F.col("doc_id") - F.col("doc_id") % SHIFT)
                + F.expr(f"((doc_id % {SHIFT}) * 31 + _j * 17) % {base_n}")
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return docs, edges


def _probe_scc(spark, d):
    from basic_data_pipeline_spark.operators import linkgraph

    # trim/coloring/backward round COUNTS are set by one copy's
    # structure (copies are independent closed subgraphs), so the probe
    # measures per-round work growing with the node/edge count — the
    # design claim is linear walls, constant round count.
    _docs, edges = _synthetic_copy_graph(spark, d)
    return linkgraph.strongly_connected_components(edges)


def _probe_lpa(spark, d):
    from basic_data_pipeline_spark.operators import linkgraph

    _docs, edges = _synthetic_copy_graph(spark, d)
    return linkgraph.label_propagation(edges, iterations=4)


def _probe_triangles(spark, d):
    from basic_data_pipeline_spark.operators import linkgraph

    # the degree orientation's O(sqrt m) wedge bound is the claim under
    # test: the wedge join must grow with edges, not with degree^2
    _docs, edges = _synthetic_copy_graph(spark, d)
    return linkgraph.triangle_counts(edges)


def _probe_coreness(spark, d):
    from basic_data_pipeline_spark.operators import linkgraph

    # fixed-round replay mode (8): measures the per-round join+window
    # geometry without convergence-dependent round counts
    _docs, edges = _synthetic_copy_graph(spark, d)
    return linkgraph.coreness(edges, iterations=8)


def _probe_knlm(spark, d):
    from basic_data_pipeline_spark.operators import ngramlm

    # self-trained KN over the documents table: model tables are bigram
    # TYPE-bounded, so unperturbed 16x (identical content) should grow
    # only the scoring side; PERTURB=1 grows the type tables too (every
    # token distinct per copy) — the honest-corpus case.
    docs = load_table(spark, d, "documents").select("doc_id", "text")
    return ngramlm.kneser_ney_lm_scores(docs)


def _probe_unigram_train_encode(spark, d):
    from basic_data_pipeline_spark.operators import unigram

    # train is distinct-word-sized (constant at unperturbed 16x, the
    # word_freqs trick; PERTURB=1 grows the word table ~copies-fold);
    # encode is corpus-sized in both modes. The returned aggregate
    # forces the whole encode.
    docs = load_table(spark, d, "documents").select("doc_id", "text")
    model = unigram.train_unigram(
        docs, vocab_size=500, rounds=2, max_piece_len=4, seed_size=2000
    )
    return unigram.encode_unigram(docs, model, ids=True).agg(
        F.sum("n_pieces").alias("total_pieces"),
        F.count("*").alias("n_docs"),
    )


EXTRA_PROBES = {
    "op_pagerank": _probe_pagerank,
    "op_hits": _probe_hits,
    "op_scc": _probe_scc,
    "op_lpa": _probe_lpa,
    "op_triangles": _probe_triangles,
    "op_coreness": _probe_coreness,
    "op_knlm": _probe_knlm,
    "op_unigram_train_encode": _probe_unigram_train_encode,
    "op_audio_match": _probe_audio_match,
    "op_image_near_dup": _probe_image_near_dup,
    "op_gapfill_linear": _probe_gapfill,
    "op_winnow_overlap": _probe_winnow_overlap,
    "op_c4_gopher_profile": _probe_c4_gopher_profile,
    "op_score_buckets": _probe_score_buckets,
    "op_sq8_search": _probe_sq8_search,
    "op_token_budget_mix": _probe_token_budget_mix,
    "op_phrase_blocklist": _probe_phrase_blocklist,
    "op_leakage_splits": _probe_leakage_splits,
    "op_bm25_topk": _probe_bm25_topk,
    "op_dsir_resample": _probe_dsir_resample,
    "op_domain_cap": _probe_domain_cap,
    "op_quality_profile": _probe_quality_profile,
    "op_quality_checks": _probe_quality_checks,
    "op_table_diff": _probe_table_diff,
    "op_psi_drift": _probe_psi_drift,
    "op_bpe_train": _probe_bpe_train,
    "op_bpe_encode": _probe_bpe_encode,
    "op_random_projection": _probe_random_projection,
    "op_pca_fit_project": _probe_pca_fit_project,
    "op_near_dedup_quality": _probe_near_dedup_quality,
    "op_fuzzy_pairs": _probe_fuzzy_pairs,
    "op_heavy_hitters": _probe_heavy_hitters,
    "op_chunk_documents": _probe_chunk_documents,
    "op_tfidf_top_terms": _probe_tfidf_top_terms,
    "op_negative_samples": _probe_negative_samples,
    "op_sessionize_stats": _probe_sessionize_stats,
    "op_line_dedup": _probe_line_dedup,
    "op_ann_lsh_auto": _probe_ann_lsh_auto,
    "op_ann_lsh_capped": _probe_ann_lsh_capped,
    "op_ann_lsh_codeattach": _probe_ann_lsh_codeattach,
    "op_pipeline_e2e": _probe_pipeline_e2e,
    "op_pack_sequences": _probe_pack_sequences,
    "op_pack_token_windows": _probe_pack_token_windows,
    "op_contamination_hits": _probe_contamination_hits,
    "op_ivfpq_search": _probe_ivfpq_search,
    "op_scd2_apply": _probe_scd2_apply,
    "op_cms_build_merge": _probe_cms,
    "op_bigram_lm_scores": _probe_bigram_lm,
    "op_binned_range_join": _probe_binned_range_join,
    "op_repetition_profile": _probe_repetition_profile,
    "op_substring_dedup": _probe_substring_dedup,
    "op_lr_train": _probe_lr_train,
}


def main() -> None:
    spark = get_spark("scale_probe")
    filters = sys.argv[1:]
    qs = {
        n: fn
        for n, fn in {**headline_queries(), **EXTRA_PROBES}.items()
        if not filters or any(f in n for f in filters)
    }
    print(f"building {COPIES}x probe dir at {PROBE_DIR} ...", file=sys.stderr)
    build_probe_dir(spark)

    # warm
    next(iter(qs.values()))(spark, BASE).write.format("noop").mode(
        "overwrite"
    ).save()

    for name, fn in qs.items():
        t0 = time.time()
        fn(spark, BASE).write.format("noop").mode("overwrite").save()
        base_s = time.time() - t0
        t0 = time.time()
        fn(spark, PROBE_DIR).write.format("noop").mode("overwrite").save()
        big_s = time.time() - t0
        print(
            f"{name:28s} sf0.1={base_s:6.2f}s  {COPIES}x={big_s:7.2f}s "
            f" ratio={big_s / max(base_s, 1e-9):5.1f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
