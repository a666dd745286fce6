"""DSIR importance resampling (operators/selection.py): serial-reference
equivalence, partitioning invariance, target affinity, model reuse."""

from __future__ import annotations

import hashlib
import math
import re
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import selection

N_BUCKETS = 64  # small so buckets collide, exercising the hashed fold


def _grams(text: str, ns=(1, 2)):
    w = re.split(r"\s+", text.lower())
    out = []
    for n in ns:
        for i in range(max(len(w) - n, 0) + 1):
            out.append(" ".join(w[i : i + n]))
    return out


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % N_BUCKETS


def _serial_log_weights(raw, target, alpha=1.0):
    """Pure-Python DSIR: returns {doc_id: Decimal log_w}."""
    t_counts: dict[int, int] = {}
    r_counts: dict[int, int] = {}
    per_doc: dict[int, dict[int, int]] = {}
    for _id, text in target:
        for g in _grams(text):
            t_counts[_bucket(g)] = t_counts.get(_bucket(g), 0) + 1
    for _id, text in raw:
        d = per_doc.setdefault(_id, {})
        for g in _grams(text):
            b = _bucket(g)
            r_counts[b] = r_counts.get(b, 0) + 1
            d[b] = d.get(b, 0) + 1
    T, R = sum(t_counts.values()), sum(r_counts.values())
    lam = {}
    for b in set(t_counts) | set(r_counts):
        p = (t_counts.get(b, 0) + alpha) / (T + alpha * N_BUCKETS)
        q = (r_counts.get(b, 0) + alpha) / (R + alpha * N_BUCKETS)
        lam[b] = Decimal(str(round(math.log(p) - math.log(q), 6)))
    return {
        _id: sum((Decimal(c) * lam[b] for b, c in d.items()), Decimal(0))
        for _id, d in per_doc.items()
    }


RAW = [
    (1, "alpha beta gamma alpha beta"),
    (2, "delta epsilon zeta eta theta iota"),
    (3, "alpha alpha alpha beta"),
    (4, "kappa lambda mu nu xi omicron pi"),
    (5, "alpha beta alpha gamma"),
    (6, "rho sigma tau upsilon phi chi psi"),
]
TARGET = [
    (100, "alpha beta alpha beta gamma"),
    (101, "alpha gamma beta alpha"),
]


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, tgt


def test_log_weights_match_serial_reference(spark, frames):
    raw, tgt = frames
    rc = selection.hashed_ngram_counts(raw, "doc_id", "text", N_BUCKETS)
    tc = selection.hashed_ngram_counts(tgt, "doc_id", "text", N_BUCKETS)
    lam = selection.importance_log_ratios(tc, rc, N_BUCKETS)
    got = {
        r["doc_id"]: Decimal(r["log_w"])
        for r in selection.importance_log_weights(rc, lam, "doc_id").collect()
    }
    want = _serial_log_weights(RAW, TARGET)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) == 0, (k, got[k], want[k])


def test_partitioning_invariance(spark, frames):
    raw, tgt = frames

    def run(r, t):
        rc = selection.hashed_ngram_counts(r, "doc_id", "text", N_BUCKETS)
        tc = selection.hashed_ngram_counts(t, "doc_id", "text", N_BUCKETS)
        lam = selection.importance_log_ratios(tc, rc, N_BUCKETS)
        return sorted(
            (x["doc_id"], Decimal(x["log_w"]))
            for x in selection.importance_log_weights(rc, lam, "doc_id").collect()
        )

    assert run(raw, tgt) == run(raw.repartition(7), tgt.repartition(3))


def test_on_target_docs_outweigh_off_target(spark, frames):
    raw, tgt = frames
    rc = selection.hashed_ngram_counts(raw, "doc_id", "text", N_BUCKETS)
    tc = selection.hashed_ngram_counts(tgt, "doc_id", "text", N_BUCKETS)
    lam = selection.importance_log_ratios(tc, rc, N_BUCKETS)
    w = {
        r["doc_id"]: float(r["log_w"])
        for r in selection.importance_log_weights(rc, lam, "doc_id").collect()
    }
    # every alpha/beta/gamma doc (the target's vocabulary) must outweigh
    # every disjoint-vocabulary doc
    for on in (1, 3, 5):
        for off in (2, 4, 6):
            assert w[on] > w[off], (on, off, w)


def test_resample_deterministic_and_target_biased(spark, frames):
    raw, tgt = frames
    sel = selection.importance_resample(
        raw, tgt, "doc_id", "text", k=3, n_buckets=N_BUCKETS
    )
    ids1 = [r["doc_id"] for r in sel.collect()]
    ids2 = [r["doc_id"] for r in sel.collect()]
    assert ids1 == ids2 and len(ids1) == 3
    # with weights this lopsided the sample must lean on-target
    assert len(set(ids1) & {1, 3, 5}) >= 2


def test_model_reuse_roundtrip(spark, frames, tmp_path):
    raw, tgt = frames
    rc = selection.hashed_ngram_counts(raw, "doc_id", "text", N_BUCKETS)
    tc = selection.hashed_ngram_counts(tgt, "doc_id", "text", N_BUCKETS)
    lam = selection.importance_log_ratios(tc, rc, N_BUCKETS)
    path = str(tmp_path / "dsir_model")
    lam.write.parquet(path)
    reloaded = spark.read.parquet(path)
    direct = selection.importance_resample(
        raw, tgt, "doc_id", "text", k=3, n_buckets=N_BUCKETS
    ).collect()
    reused = selection.importance_resample(
        raw, tgt, "doc_id", "text", k=3, n_buckets=N_BUCKETS,
        log_ratios=reloaded,
    ).collect()
    assert [r["doc_id"] for r in direct] == [r["doc_id"] for r in reused]
    assert [Decimal(r["log_w"]) for r in direct] == [
        Decimal(r["log_w"]) for r in reused
    ]


def test_gumbel_key_properties(spark):
    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"), F.lit(0.0).alias("log_w")
    )
    keyed = df.select(
        "doc_id",
        selection.gumbel_key(F.col("log_w"), F.col("doc_id")).alias("g"),
    ).collect()
    vals = [r["g"] for r in keyed]
    assert all(math.isfinite(v) for v in vals)
    # Gumbel(0,1): median ~0.3665, and values spread well beyond it
    assert min(vals) < -0.5 and max(vals) > 1.5


def test_frozen_model_covers_full_bucket_domain(spark, frames):
    """The model has exactly one row per bucket id, so a FROZEN model
    applied to novel vocabulary prices unseen buckets with the smoothed
    default ln((R+aB)/(T+aB)) — not a silent 0 that would reject
    exactly the out-of-distribution docs smoothing exists to price."""
    raw, tgt = frames
    rc = selection.hashed_ngram_counts(raw, "doc_id", "text", N_BUCKETS)
    tc = selection.hashed_ngram_counts(tgt, "doc_id", "text", N_BUCKETS)
    lam_df = selection.importance_log_ratios(tc, rc, N_BUCKETS)
    lam = {r["bucket"]: Decimal(r["lam"]) for r in lam_df.collect()}
    assert set(lam) == set(range(N_BUCKETS))
    # serial default for a bucket unseen in BOTH corpora
    T = sum(len(_grams(t)) for _, t in TARGET)
    R = sum(len(_grams(t)) for _, t in RAW)
    default = Decimal(
        str(round(math.log((0 + 1) / (T + N_BUCKETS))
                  - math.log((0 + 1) / (R + N_BUCKETS)), 6))
    )
    seen = {_bucket(g) for _, t in RAW + TARGET for g in _grams(t)}
    unseen = set(range(N_BUCKETS)) - seen
    assert unseen, "fixture must leave some buckets unseen"
    for b in unseen:
        assert lam[b] == default
    assert default > 0  # raw pool >> target: novelty is priced UP here
    # end to end: a novel-vocabulary doc's weight is the bucket-wise sum
    novel = spark.createDataFrame(
        [(99, "zzz yyy xxx zzz")], "doc_id long, text string"
    )
    nc = selection.hashed_ngram_counts(novel, "doc_id", "text", N_BUCKETS)
    got = Decimal(
        selection.importance_log_weights(nc, lam_df, "doc_id")
        .collect()[0]["log_w"]
    )
    want = sum(
        (lam[_bucket(g)] for g in _grams("zzz yyy xxx zzz")), Decimal(0)
    )
    assert got == want != 0


def test_threshold_selection_matches_topk_semantics(spark, frames):
    """The corpus-scale threshold path never moves documents to the
    driver; its result is exactly the top-|result| by key (thresholding
    a total order cannot skip a higher key) and lands near expected_k."""
    raw, tgt = frames
    sel = selection.importance_resample_threshold(
        raw, tgt, "doc_id", "text", expected_k=3, n_buckets=N_BUCKETS,
    )
    rows = sel.collect()
    assert 2 <= len(rows) <= 4  # quantile lands between adjacent keys
    all_keys = {
        r["doc_id"]: r["sel_key"]
        for r in selection.importance_resample(
            raw, tgt, "doc_id", "text", k=len(RAW), n_buckets=N_BUCKETS
        ).collect()
    }
    kept = {r["doc_id"] for r in rows}
    worst_kept = min(all_keys[d] for d in kept)
    best_dropped = max(
        (all_keys[d] for d in all_keys if d not in kept), default=float("-inf")
    )
    assert worst_kept >= best_dropped
    # expected_k >= n keeps everything
    assert selection.importance_resample_threshold(
        raw, tgt, "doc_id", "text", expected_k=100, n_buckets=N_BUCKETS,
    ).count() == len(RAW)


def test_kl_divergence_matches_serial_and_drops_after_selection(spark, frames):
    """KL(target||selected) < KL(target||raw) on the fixture — selection
    moves the pool toward the target — and the value matches a serial
    reference."""
    raw, tgt = frames
    rc = selection.hashed_ngram_counts(raw, "doc_id", "text", N_BUCKETS)
    tc = selection.hashed_ngram_counts(tgt, "doc_id", "text", N_BUCKETS)

    def serial_kl(p_corpus, q_corpus):
        pc, qc = {}, {}
        for _, t in p_corpus:
            for g in _grams(t):
                pc[_bucket(g)] = pc.get(_bucket(g), 0) + 1
        for _, t in q_corpus:
            for g in _grams(t):
                qc[_bucket(g)] = qc.get(_bucket(g), 0) + 1
        P, Q = sum(pc.values()), sum(qc.values())
        kl = 0.0
        for b in range(N_BUCKETS):
            p = (pc.get(b, 0) + 1) / (P + N_BUCKETS)
            q = (qc.get(b, 0) + 1) / (Q + N_BUCKETS)
            kl += p * (math.log(p) - math.log(q))
        return kl

    got_raw = selection.hashed_kl_divergence(tc, rc, N_BUCKETS).first()[
        "kl_nats"
    ]
    assert got_raw == pytest.approx(serial_kl(TARGET, RAW), rel=1e-9)
    # select the on-target half deterministically, re-measure
    sel_ids = {
        r["doc_id"]
        for r in selection.importance_resample(
            raw, tgt, "doc_id", "text", k=3, n_buckets=N_BUCKETS
        ).collect()
    }
    sel_rows = [(d, t) for d, t in RAW if d in sel_ids]
    sc = selection.hashed_ngram_counts(
        spark.createDataFrame(sel_rows, "doc_id long, text string"),
        "doc_id", "text", N_BUCKETS,
    )
    got_sel = selection.hashed_kl_divergence(tc, sc, N_BUCKETS).first()[
        "kl_nats"
    ]
    assert got_sel == pytest.approx(serial_kl(TARGET, sel_rows), rel=1e-9)
    assert got_sel < got_raw  # the selection diagnostic
