"""Distributed BPE training/encoding vs a serial reference
(operators/bpe.py)."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import bpe


# --- serial reference implementation (pure python) ------------------------

def serial_train(texts: list[str], n_merges: int, min_pair_freq: int = 2):
    freqs = collections.Counter(
        w for t in texts for w in t.lower().split() if w
    )
    vocab = {w: list(w) for w in freqs}
    merges = []
    for rank in range(n_merges):
        pc: collections.Counter = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += freqs[w]
        if not pc:
            break
        # (count desc, a asc, b asc)
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_freq:
            break
        merges.append((rank, a, b, n))

        def apply_one(syms):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out

        vocab = {w: apply_one(s) for w, s in vocab.items()}
    return merges


TEXTS = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest",
    "the newest and the widest and the lowest",
]


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_train_matches_serial_reference(tiny):
    got = bpe.train_bpe(tiny, "text", 12)
    want = serial_train(TEXTS, 12)
    assert got == want
    assert len(got) > 3  # the corpus supports a real merge sequence


def test_train_partition_invariant(tiny):
    assert bpe.train_bpe(tiny.repartition(7), "text", 6) == bpe.train_bpe(
        tiny.coalesce(1), "text", 6
    )


def test_train_early_stop_on_min_freq(spark):
    # every word unique once -> all pair counts are 1 < min_pair_freq
    df = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    assert bpe.train_bpe(df, "text", 5, min_pair_freq=2) == []


def test_train_validates_params(tiny):
    with pytest.raises(ValueError):
        bpe.train_bpe(tiny, "text", 0)


def test_jvm_fold_equals_serial_merge(spark):
    # "" excluded: Spark split("", "") is [""] while list("") is [] —
    # irrelevant to training, where word_freqs filters empty words out.
    words = ["aaa", "aaaa", "banana", "abab", "a", "aab"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["m"]
        for r in df.select(
            "w",
            bpe.apply_merge_jvm(F.split("w", ""), "a", "a").alias("m"),
        ).collect()
    }
    for w in words:
        assert got[w] == bpe._apply_merges_serial(w, [("a", "a")]), w


def test_encode_matches_serial_and_counts(tiny):
    merges = bpe.train_bpe(tiny, "text", 8)
    enc = {
        r["doc_id"]: r
        for r in bpe.encode_bpe(tiny, merges, "doc_id", "text").collect()
    }
    pairs = [(a, b) for _, a, b, _ in merges]
    for i, t in enumerate(TEXTS):
        want = [
            s for w in t.lower().split()
            for s in bpe._apply_merges_serial(w, pairs)
        ]
        assert enc[i]["tokens"] == want
        assert enc[i]["n_tokens"] == len(want)
    # merging strictly reduces token count vs chars
    chars = sum(len(w) for t in TEXTS for w in t.split())
    assert sum(r["n_tokens"] for r in enc.values()) < chars


def test_encode_no_merges_is_chars(tiny):
    enc = bpe.encode_bpe(tiny, [], "doc_id", "text").collect()
    for r in enc:
        assert all(len(t) == 1 for t in r["tokens"])


def test_roundtrip_reconstructs_text(tiny):
    """Concatenating tokens per word boundary reproduces the lowered
    text — BPE is a segmentation, never lossy."""
    merges = bpe.train_bpe(tiny, "text", 8)
    enc = {
        r["doc_id"]: "".join(r["tokens"])
        for r in bpe.encode_bpe(tiny, merges, "doc_id", "text").collect()
    }
    for i, t in enumerate(TEXTS):
        assert enc[i] == t.lower().replace(" ", "")


def test_bpe_token_aware_packing(spark, tiny):
    """Composition: pack_sequences over the TOKENIZER's counts instead of
    whitespace counts — window arithmetic must agree with a serial scan
    of the encoded corpus (the real training-data layout contract)."""
    from pyspark.sql import functions as F

    from basic_data_pipeline_spark.operators import packing

    merges = bpe.train_bpe(tiny, "text", 8)
    enc = bpe.encode_bpe(tiny, merges, "doc_id", "text")
    seq_len = 16
    got = {
        r["doc_id"]: (r["n_tok"], r["seq_bin"], r["bin_pos"])
        for r in packing.pack_sequences(
            enc, "doc_id", F.col("n_tokens"), seq_len
        ).collect()
    }
    counts = {
        r["doc_id"]: r["n_tokens"]
        for r in enc.select("doc_id", "n_tokens").collect()
    }
    cum = 0
    for did in sorted(counts):
        assert got[did] == (counts[did], cum // seq_len, cum % seq_len)
        cum += counts[did]


def test_fixture_corpus_trains(spark, sf_dir):
    """End-to-end on the real documents fixture: merges exist, encode
    runs, and the merge table persists via merges_df."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    merges = bpe.train_bpe(d, "text", 5)
    assert 0 < len(merges) <= 5
    mdf = bpe.merges_df(spark, merges)
    assert mdf.count() == len(merges)
    n = bpe.encode_bpe(d, merges, "doc_id", "text").count()
    assert n == 100
