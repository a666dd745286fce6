"""Exact substring dedup (operators/substring.py): every behavior pinned
against a brute-force serial Python reference implementing the same
policy (first-occurrence-wins over ≥k-token repeated windows), plus
structural properties on fixture documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import substring

SF_DIR = "/root/testdata/sf0.001"


# --- serial reference: the policy in plain Python ------------------------

def serial_substring_dedup(
    corpus: dict[int, str], k: int
) -> dict[int, str]:
    """Brute-force reference: token-tuple grams (no hashing), global
    first occurrence by (doc_id, pos), covered tokens removed, text
    rebuilt with single spaces. Mirrors substring_dedup_corpus exactly
    (up to xxhash64 collisions, absent at test scale)."""
    toks = {d: corpus[d].split() for d in corpus}
    first: dict[tuple, tuple[int, int]] = {}
    count: dict[tuple, int] = {}
    for d in sorted(toks):
        for p in range(len(toks[d]) - k + 1):
            g = tuple(toks[d][p : p + k])
            if g not in first:
                first[g] = (d, p)
            count[g] = count.get(g, 0) + 1
    covered: set[tuple[int, int]] = set()
    for d in sorted(toks):
        for p in range(len(toks[d]) - k + 1):
            g = tuple(toks[d][p : p + k])
            if count[g] > 1 and first[g] != (d, p):
                covered.update((d, t) for t in range(p, p + k))
    out = {}
    for d in sorted(toks):
        kept = [t for i, t in enumerate(toks[d]) if (d, i) not in covered]
        if kept:
            out[d] = " ".join(kept)
    return out


def spark_result(spark, corpus: dict[int, str], k: int) -> dict[int, str]:
    df = spark.createDataFrame(
        [(d, t) for d, t in corpus.items()], "doc_id long, text string"
    )
    return {
        r["doc_id"]: r["text"]
        for r in substring.substring_dedup_corpus(df, k=k).collect()
    }


# --- fixtures ------------------------------------------------------------

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
).split()


def synth(seed: int, n: int) -> str:
    """Deterministic pseudo-text without Python RNG state leakage."""
    out = []
    x = seed
    for _ in range(n):
        x = (x * 1103515245 + 12345) % (2**31)
        out.append(WORDS[x % len(WORDS)])
    return " ".join(out)


# --- pinned-vs-serial cases ---------------------------------------------

def test_mid_document_pasted_span_removed(spark):
    """The motivating case MinHash and line dedup both miss: a long span
    pasted into the middle of two otherwise-unrelated documents."""
    span = synth(7, 40)
    corpus = {
        1: synth(1, 100) + " " + span + " " + synth(2, 100),
        2: synth(3, 120) + " " + span + " " + synth(4, 80),
        3: synth(5, 90),
    }
    got = spark_result(spark, corpus, k=8)
    want = serial_substring_dedup(corpus, k=8)
    assert got == want
    # doc 1 (first occurrence) keeps the span; doc 2 lost it
    assert span in got[1]
    assert span not in got[2]
    # the untouched doc passes through whitespace-normalized
    assert got[3] == corpus[3]


def test_within_document_repeat_removed(spark):
    phrase = synth(11, 12)
    corpus = {5: phrase + " " + synth(12, 30) + " " + phrase}
    got = spark_result(spark, corpus, k=8)
    want = serial_substring_dedup(corpus, k=8)
    assert got == want
    assert got[5].count(phrase) == 1  # second occurrence cut


def test_overlapping_windows_merge_to_maximal_span(spark):
    """A repeated 2k-token span produces k+1 overlapping duplicate
    windows; they must merge into ONE maximal span covering exactly the
    span's tokens — verified against the serial covered-set policy and
    by the span frame itself."""
    k = 6
    span = synth(21, 2 * k)
    corpus = {1: span + " " + synth(22, 50), 2: synth(23, 50) + " " + span}
    got = spark_result(spark, corpus, k=k)
    assert got == serial_substring_dedup(corpus, k=k)
    df = spark.createDataFrame(
        [(d, t) for d, t in corpus.items()], "doc_id long, text string"
    )
    spans = substring.duplicate_spans(df, k=k).collect()
    assert len(spans) == 1  # one merged span, in doc 2 only
    (s,) = spans
    assert s["doc_id"] == 2
    assert s["span_end"] - s["span_start"] + 1 == 2 * k


def test_short_docs_and_no_duplicates_pass_through(spark):
    corpus = {1: "only three tokens", 2: synth(31, 60), 3: synth(32, 60)}
    got = spark_result(spark, corpus, k=8)
    want = serial_substring_dedup(corpus, k=8)
    assert got == want == corpus  # nothing repeated, nothing dropped


def test_fully_duplicated_doc_disappears(spark):
    body = synth(41, 30)
    corpus = {1: body, 2: body}
    got = spark_result(spark, corpus, k=8)
    want = serial_substring_dedup(corpus, k=8)
    assert got == want
    assert 1 in got and 2 not in got  # doc 2 entirely covered


def test_adjacent_but_distinct_repeats_separate_spans(spark):
    """Two repeated spans separated by a gap wider than k stay two
    spans; the unique gap tokens survive."""
    k = 5
    a, b = synth(51, k + 2), synth(52, k + 2)
    gap = synth(53, 2 * k + 3)
    corpus = {
        1: a + " " + synth(54, 40) + " " + b,
        2: a + " " + gap + " " + b,
    }
    got = spark_result(spark, corpus, k=k)
    assert got == serial_substring_dedup(corpus, k=k)
    assert gap in got[2]  # the unique middle survives both removals


def test_k_below_two_rejected(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        substring.substring_dedup_corpus(df, k=1)


def test_fixture_documents_match_serial(spark):
    """End-to-end on the real documents fixture (which contains planted
    near-duplicates): Spark == serial reference on every doc."""
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(300)
    )
    corpus = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {
        r["doc_id"]: r["text"]
        for r in substring.substring_dedup_corpus(docs, k=8).collect()
    }
    want = serial_substring_dedup(
        {d: " ".join(t.split()) for d, t in corpus.items()}, k=8
    )
    assert got == want
    # the fixture's planted duplicates DO trigger removals (4 docs fully
    # covered, 6 more partially) — the test exercises the real path, not
    # the all-pass-through degenerate case
    assert len(got) < len(corpus)
    assert any(got[d] != " ".join(corpus[d].split()) for d in got)
