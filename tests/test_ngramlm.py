"""Kneser-Ney bigram LM: serial-reference pin + model invariants."""

from __future__ import annotations

import math
from collections import Counter
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import ngramlm


# --- serial reference (independent plain-Python formulation) -------------

def _ref_bigrams(text: str) -> list[tuple[str, str]]:
    toks = __import__("re").split(r"\s+", text.lower())
    return list(zip(toks, toks[1:]))


def kn_reference(
    score_docs: dict[int, str],
    train_docs: dict[int, str],
    discount=(3, 4),
) -> dict[int, tuple[int, int, Decimal]]:
    """(n_bigrams, n_backstop, sum_lp) per doc — same spec, serial."""
    num, den = discount
    c12: Counter = Counter()
    uni: set[str] = set()
    for t in train_docs.values():
        toks = __import__("re").split(r"\s+", t.lower())
        uni.update(toks)
        for b in zip(toks, toks[1:]):
            c12[b] += 1
    c1: Counter = Counter()
    n1f: Counter = Counter()
    n1b: Counter = Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1f[w1] += 1
        n1b[w2] += 1
    big_b = len(c12)
    v = len(uni)
    out = {}
    for did, t in score_docs.items():
        bis = _ref_bigrams(t)
        if not bis:
            continue
        s = Decimal(0)
        nbs = 0
        for w1, w2 in bis:
            if w1 in c1 and w2 in n1b:
                p = (
                    max(den * c12.get((w1, w2), 0) - num, 0) * float(big_b)
                    + num * float(n1f[w1] * n1b[w2])
                ) / (den * float(c1[w1]) * big_b)
            else:
                nbs += 1
                p = 1.0 / (v + 1)
            s += Decimal(str(round(math.log2(p), 6)))
        out[did] = (len(bis), nbs, s)
    return out


CORPUS = {
    0: "the cat sat on the mat",
    1: "the dog sat on the log",
    2: "a cat and a dog",
    3: "the cat the cat the cat",
    4: "completely novel words here",
    5: "solo",
    6: "the mat sat on the cat",
}
TRAIN_IDS = {0, 1, 2, 3}


def _df(spark, ids):
    return spark.createDataFrame(
        [(i, CORPUS[i]) for i in sorted(ids)], "doc_id long, text string"
    )


def test_kn_matches_serial_reference(spark):
    docs = _df(spark, CORPUS)
    train = _df(spark, TRAIN_IDS)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_backstop"], r["sum_lp"])
        for r in ngramlm.kneser_ney_lm_scores(docs, train=train).collect()
    }
    want = kn_reference(CORPUS, {i: CORPUS[i] for i in TRAIN_IDS})
    assert set(got) == set(want)  # doc 5 (1 token) emits no row
    for did, (nb, nbs, s) in want.items():
        assert got[did][0] == nb
        assert got[did][1] == nbs
        assert got[did][2] == s, f"doc {did}: {got[did][2]} != {s}"


def test_kn_self_trained_has_no_backstop(spark):
    docs = _df(spark, CORPUS)
    rows = ngramlm.kneser_ney_lm_scores(docs).collect()
    assert all(r["n_backstop"] == 0 for r in rows)


def test_kn_probabilities_sum_to_at_most_one(spark):
    """For each seen context w1, sum over the TRAIN vocabulary of
    P(w2|w1) must be exactly 1 under interpolated KN (up to double
    noise) — the model's defining invariant."""
    train = _df(spark, TRAIN_IDS)
    m = ngramlm.kn_bigram_model(train)
    vocab = m.cont.select(F.col("w2")).distinct()
    grid = m.ctx.select("w1", "c1", "n1f").crossJoin(vocab)
    p = (
        grid.join(m.pairs, ["w1", "w2"], "left")
        .join(m.cont, ["w2"], "left")
        .select(
            "w1",
            (
                (
                    F.greatest(
                        F.lit(4) * F.coalesce("c12", F.lit(0)) - F.lit(3),
                        F.lit(0),
                    ).cast("double")
                    * F.lit(float(m.n_bigram_types))
                    + F.lit(3) * (F.col("n1f") * F.col("n1b")).cast("double")
                )
                / (
                    F.lit(4)
                    * F.col("c1").cast("double")
                    * F.lit(float(m.n_bigram_types))
                )
            ).alias("p"),
        )
    )
    sums = p.groupBy("w1").agg(F.sum("p").alias("tot")).collect()
    # sums to n1b-weighted total: full mass only if every vocab word has
    # n1b counted; continuation vocab == {w2 seen}, so mass == 1 exactly
    for r in sums:
        assert abs(r["tot"] - 1.0) < 1e-9, r


def test_kn_partitioning_invariance(spark):
    docs = _df(spark, CORPUS)
    a = ngramlm.kneser_ney_lm_scores(docs.repartition(1))
    b = ngramlm.kneser_ney_lm_scores(docs.repartition(7, "doc_id"))
    ra = {r["doc_id"]: r["sum_lp"] for r in a.collect()}
    rb = {r["doc_id"]: r["sum_lp"] for r in b.collect()}
    assert ra == rb


def test_kn_natural_beats_shuffled(spark, sf_dir):
    """On fixture docs, self-trained KN mean log-prob of natural text
    exceeds that of word-shuffled text (the filtering signal works)."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    shuffled = docs.select(
        "doc_id",
        F.concat_ws(
            " ", F.shuffle(F.split(F.lower(F.col("text")), r"\s+"))
        ).alias("text"),
    )
    model = ngramlm.kn_bigram_model(docs)
    nat = ngramlm.kn_score(docs, model).agg(F.avg("mean_lp")).first()[0]
    shuf = ngramlm.kn_score(shuffled, model).agg(F.avg("mean_lp")).first()[0]
    assert nat > shuf


def test_kn_bad_discount_rejected(spark):
    with pytest.raises(ValueError):
        ngramlm.kn_bigram_model(_df(spark, TRAIN_IDS), discount=(4, 3))


def test_kn_model_pairs_persisted_with_release_hook(spark):
    """kn_bigram_model persists the type-bounded pair table so ctx/cont
    and repeated kn_score actions reuse one materialization instead of
    re-running the corpus explode (r8 ADVICE); model.unpersist()
    releases it and the model stays usable via lineage."""
    m = ngramlm.kn_bigram_model(_df(spark, TRAIN_IDS))
    assert m.pairs.storageLevel.useMemory or m.pairs.storageLevel.useDisk
    docs = _df(spark, CORPUS)
    before = {r["doc_id"]: r["sum_lp"] for r in
              ngramlm.kn_score(docs, m).collect()}
    ret = m.unpersist()
    assert ret is m
    assert not (m.pairs.storageLevel.useMemory
                or m.pairs.storageLevel.useDisk)
    after = {r["doc_id"]: r["sum_lp"] for r in
             ngramlm.kn_score(docs, m).collect()}
    assert before == after
