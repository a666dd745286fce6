"""Unigram-LM tokenizer: serial-trainer pin, encode semantics, model
round-trip, partitioning invariance, hypothesis fuzz."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st

from basic_data_pipeline_spark.operators import unigram as U


# --- independent serial trainer (same spec, no Spark) ---------------------

def _serial_word_freqs(docs: list[str]) -> dict[str, int]:
    wf: dict[str, int] = {}
    for t in docs:
        for w in t.lower().split():
            wf[w] = wf.get(w, 0) + 1
    return wf


def train_unigram_serial(
    word_freq: dict[str, int],
    vocab_size: int,
    rounds: int = 3,
    max_piece_len: int = 8,
    seed_size: int = 8000,
    shrink: float = 0.75,
) -> dict[str, float]:
    # seed: weighted substring counts
    counts: dict[str, int] = {}
    for w, f in word_freq.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - i) + 1):
                p = w[i : i + l]
                counts[p] = counts.get(p, 0) + f
    top = sorted(counts.items(), key=lambda pc: (-pc[1], pc[0]))[:seed_size]
    seed = dict(top)
    for p, c in counts.items():
        if len(p) == 1:
            seed.setdefault(p, c)
    total = sum(seed.values())
    scores = {p: round(math.log(c / total), 6) for p, c in seed.items()}
    size = len(scores)
    for rnd in range(rounds):
        cnt: dict[str, int] = {}
        for w, f in word_freq.items():
            for p in U.viterbi_segment(w, scores, max_piece_len):
                cnt[p] = cnt.get(p, 0) + f
        for p in scores:  # required-chars rule
            if len(p) == 1:
                cnt[p] = max(cnt.get(p, 0), 1)
        if rnd < rounds - 1:
            size = max(vocab_size, math.ceil(size * shrink))
        else:
            size = vocab_size
        singles = {p: c for p, c in cnt.items() if len(p) == 1}
        multis = sorted(
            ((p, c) for p, c in cnt.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        kept = dict(multis[: max(size - len(singles), 0)])
        kept.update(singles)
        total = sum(kept.values())
        scores = {
            p: round(math.log(c / total), 6)
            for p, c in kept.items()
            if c > 0
        }
        size = len(scores)
    return scores


CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "cats and dogs and cats",
    "the the the mat mat",
    "concatenation of the nation",
]


def _docs(spark, texts=CORPUS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_train_matches_serial(spark):
    model = U.train_unigram(
        _docs(spark), vocab_size=30, rounds=3, max_piece_len=4,
        seed_size=60,
    )
    want = train_unigram_serial(
        _serial_word_freqs(CORPUS), vocab_size=30, rounds=3,
        max_piece_len=4, seed_size=60,
    )
    assert model.pieces == want


def test_train_partitioning_invariance(spark):
    a = U.train_unigram(
        _docs(spark).repartition(1), vocab_size=25, rounds=2,
        max_piece_len=4, seed_size=50,
    )
    b = U.train_unigram(
        _docs(spark).repartition(7, "doc_id"), vocab_size=25, rounds=2,
        max_piece_len=4, seed_size=50,
    )
    assert a.pieces == b.pieces


def test_viterbi_tie_rules():
    # equal scores: prefer fewer pieces
    pieces = {"ab": -1.0, "a": -0.5, "b": -0.5, "abab": -2.0}
    assert U.viterbi_segment("abab", pieces, 4) == ["abab"]
    # unknown char falls back to single-char UNK
    assert U.viterbi_segment("axb", {"a": -1.0, "b": -1.0}, 4) == [
        "a", "x", "b",
    ]
    assert U.viterbi_segment("", {"a": -1.0}, 4) == []


def test_encode_round_trips_text(spark):
    docs = _docs(spark)
    model = U.train_unigram(
        docs, vocab_size=30, rounds=2, max_piece_len=4, seed_size=60
    )
    out = {
        r["doc_id"]: r["pieces"]
        for r in U.encode_unigram(docs, model).collect()
    }
    for i, t in enumerate(CORPUS):
        assert "".join(out[i]) == t.lower().replace(" ", "")


def test_encode_ids_and_unseen_chars(spark):
    docs = _docs(spark)
    model = U.train_unigram(
        docs, vocab_size=30, rounds=2, max_piece_len=4, seed_size=60
    )
    weird = spark.createDataFrame(
        [(0, "the cät")], "doc_id long, text string"
    )
    row = U.encode_unigram(weird, model, ids=True).collect()[0]
    assert -1 in row["piece_ids"]  # unseen char -> UNK id
    known = [i for i in row["piece_ids"] if i >= 0]
    assert known and all(i < len(model.pieces) for i in known)
    assert row["n_pieces"] == len(row["piece_ids"])


def test_model_df_round_trip(spark):
    model = U.train_unigram(
        _docs(spark), vocab_size=20, rounds=1, max_piece_len=3,
        seed_size=40,
    )
    back = U.unigram_model_from_df(U.unigram_model_df(spark, model))
    assert back == model


def test_singles_never_pruned(spark):
    # tightest legal budget: vocab_size == alphabet size (anything
    # smaller raises — see test_vocab_smaller_than_alphabet_raises)
    chars = {c for t in CORPUS for c in t.lower() if c != " "}
    model = U.train_unigram(
        _docs(spark), vocab_size=len(chars), rounds=2, max_piece_len=4,
        seed_size=40,
    )
    assert chars <= set(model.pieces)


def test_bad_params_rejected(spark):
    with pytest.raises(ValueError):
        U.train_unigram(_docs(spark), vocab_size=100, seed_size=50)
    with pytest.raises(ValueError):
        U.train_unigram(_docs(spark), shrink=0.0)


def test_vocab_smaller_than_alphabet_raises(spark):
    """Single chars are never pruned, so vocab_size below the corpus
    alphabet could only end over budget while the model claimed the
    requested size — SentencePiece errors here, and so do we (r8
    ADVICE)."""
    n_alphabet = len(set("".join(CORPUS)) - {" "})
    assert n_alphabet > 10  # fixture sanity
    with pytest.raises(ValueError, match="alphabet"):
        U.train_unigram(
            _docs(spark), vocab_size=10, seed_size=10, max_piece_len=4
        )
    # at exactly the alphabet size training succeeds with a pure
    # single-char vocabulary of the claimed size
    m = U.train_unigram(
        _docs(spark), vocab_size=n_alphabet, seed_size=n_alphabet,
        max_piece_len=4, rounds=2,
    )
    assert len(m.pieces) == n_alphabet
    assert all(len(p) == 1 for p in m.pieces)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=6),
            min_size=1,
            max_size=6,
        ).map(" ".join),
        min_size=1,
        max_size=5,
    ),
    st.integers(min_value=4, max_value=12),
)
@pytest.mark.slow
def test_fuzz_train_matches_serial(spark, texts, vocab):
    model = U.train_unigram(
        _docs(spark, texts), vocab_size=vocab, rounds=2,
        max_piece_len=3, seed_size=vocab + 20,
    )
    want = train_unigram_serial(
        _serial_word_freqs(texts), vocab_size=vocab, rounds=2,
        max_piece_len=3, seed_size=vocab + 20,
    )
    assert model.pieces == want
