"""Robust winnowing fingerprints (operators/dedup.py winnow_*) — pinned
against a serial Python reference, plus the scheme's two guarantees
(detection of shared runs >= k + window - 1, density <= one per
window)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import dedup

K, WIN = 3, 4


def _h32(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)


def _serial_winnow(text: str, k: int = K, window: int = WIN):
    w = text.lower().split()
    n_grams = max(len(w) - k, 0) + 1
    hashes = [
        (_h32(" ".join(w[i : i + k])), i) for i in range(n_grams)
    ]
    sel = set()
    if len(hashes) < window:
        windows = [hashes]
    else:
        windows = [
            hashes[j : j + window] for j in range(len(hashes) - window + 1)
        ]
    for win in windows:
        # min hash, rightmost position on ties
        m = min(h for h, _ in win)
        pos = max(p for h, p in win if h == m)
        sel.add((pos, m))
    return sel


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "a wholly different document with completely other words inside it"),
    # doc 2 shares a 7-token run with doc 0 (>= k + window - 1 = 6)
    (2, "unrelated prefix tokens here fox jumps over the lazy dog near something else"),
    (3, "tiny doc"),          # fewer tokens than k
    (4, "one two three four"),  # fewer hashes than the window
    (5, "rep rep rep rep rep rep rep rep"),  # all-equal hashes (tie storm)
]


@pytest.fixture(scope="module")
def fps(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return dedup.winnow_fingerprints(df, "doc_id", "text", K, WIN)


def test_winnow_matches_serial_reference(fps):
    got: dict[int, set] = {}
    for r in fps.collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for doc_id, txt in DOCS:
        assert got.get(doc_id, set()) == _serial_winnow(txt), doc_id


def test_winnow_partitioning_invariant(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = set(map(tuple, dedup.winnow_fingerprints(
        df, "doc_id", "text", K, WIN).collect()))
    b = set(map(tuple, dedup.winnow_fingerprints(
        df.repartition(7), "doc_id", "text", K, WIN).collect()))
    assert a == b


def test_winnow_detects_shared_run(fps):
    """Docs 0 and 2 share a >= k+window-1 token run -> >= 1 shared fp."""
    pairs = {
        (r["id_a"], r["id_b"]): r["shared"]
        for r in dedup.winnow_overlap_pairs(fps, "doc_id", 1).collect()
    }
    assert (0, 2) in pairs
    assert (0, 1) not in pairs and (1, 2) not in pairs


def test_winnow_density_bound(fps):
    """At most one fingerprint per window position (n_fps <= n_hashes)."""
    counts = {
        r["doc_id"]: r["n"]
        for r in fps.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    for doc_id, txt in DOCS:
        n_hashes = max(len(txt.split()) - K, 0) + 1
        assert 1 <= counts[doc_id] <= n_hashes


def test_winnow_tie_storm_single_fingerprint(fps):
    """All-equal hashes collapse to one fingerprint per window minimum —
    the rightmost-tie rule keeps the selection stable, and dedupe
    leaves the distinct (pos, fp) set the serial reference picks."""
    rows = [r for r in fps.collect() if r["doc_id"] == 5]
    assert {(r["pos"], r["fp"]) for r in rows} == _serial_winnow(DOCS[5][1])


def test_winnow_maxdf_prunes_boilerplate(spark):
    rows = [(i, "shared boilerplate everywhere common tokens") for i in range(10)]
    rows += [(100, "alpha beta gamma delta epsilon zeta"),
             (101, "alpha beta gamma delta epsilon zeta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    f = dedup.winnow_fingerprints(df, "doc_id", "text", K, WIN)
    capped = dedup.winnow_overlap_pairs(f, "doc_id", 1, max_fp_df=5).collect()
    ids = {(r["id_a"], r["id_b"]) for r in capped}
    assert (100, 101) in ids
    assert all(a >= 100 for a, _ in ids)  # the 10-doc clique pruned


def test_winnow_validates(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup.winnow_fingerprints(df, "doc_id", "text", 0, WIN)
    with pytest.raises(ValueError):
        dedup.winnow_fingerprints(df, "doc_id", "text", K, 0)
