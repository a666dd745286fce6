"""Line-level dedup: boilerplate removal, first-occurrence span dedup,
round-trip reassembly, partition invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import dedup

BP = "accept cookies to continue"
DOCS = [
    (0, f"alpha beta gamma\n{BP}\ndelta epsilon"),
    (1, f"{BP}\nzeta eta theta\nrepeat me"),
    (2, f"iota kappa\n{BP}\nrepeat me"),
    (3, "unique only here\nrepeat me"),
    (4, f"{BP}"),  # all-boilerplate doc: vanishes under drop_common
    (5, "self repeat\nself repeat\ntail line"),
]


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_drop_common_removes_boilerplate_everywhere(spark):
    kept = dedup.dedup_lines(
        dedup.segment_lines(_docs(spark)), mode="drop_common", max_doc_freq=2
    )
    lines = [r["line"] for r in kept.collect()]
    assert BP not in lines  # in 4 docs > 2 → gone from all of them
    # "repeat me" is in 3 docs > 2 → also gone
    assert "repeat me" not in lines
    # unique lines survive
    assert "alpha beta gamma" in lines and "unique only here" in lines


def test_drop_common_threshold_is_distinct_docs(spark):
    """Within-doc repetition does not count toward the doc-frequency
    threshold: doc 5's line appears twice in ONE doc and survives."""
    kept = dedup.dedup_lines(
        dedup.segment_lines(_docs(spark)), mode="drop_common", max_doc_freq=2
    )
    got = kept.filter(F.col("line") == "self repeat").count()
    assert got == 2


def test_keep_first_global_and_within_doc(spark):
    kept = dedup.dedup_lines(
        dedup.segment_lines(_docs(spark)), mode="keep_first"
    )
    rows = {(r["doc_id"], r["line_no"]): r["line"] for r in kept.collect()}
    # BP survives exactly once, at its first (doc_id, line_no) = (0, 1)
    bp_at = [k for k, v in rows.items() if v == BP]
    assert bp_at == [(0, 1)]
    # "repeat me" first occurs at (1, 2)
    rm_at = [k for k, v in rows.items() if v == "repeat me"]
    assert rm_at == [(1, 2)]
    # within-doc repeat: only the first "self repeat" of doc 5 survives
    sr_at = [k for k, v in rows.items() if v == "self repeat"]
    assert sr_at == [(5, 0)]


def test_reassemble_round_trip(spark):
    """No-op dedup (huge threshold) reassembles the exact original text."""
    d = _docs(spark)
    out = dedup.line_dedup_corpus(d, max_doc_freq=10**9)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    want = dict(DOCS)
    assert got == want


def test_line_dedup_corpus_drops_all_boilerplate_doc(spark):
    out = dedup.line_dedup_corpus(_docs(spark), max_doc_freq=2)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert 4 not in got  # every line dropped → doc absent
    assert got[0] == "alpha beta gamma\ndelta epsilon"
    assert got[3] == "unique only here"
    assert got[5] == "self repeat\nself repeat\ntail line"


def test_partition_invariance(spark):
    d = _docs(spark)
    a = dedup.line_dedup_corpus(d.repartition(1), max_doc_freq=2)
    b = dedup.line_dedup_corpus(d.repartition(7, "text"), max_doc_freq=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_segment_word_lines_covers_all_tokens(spark):
    """Fixed-width word segmentation is a partition of the token stream:
    rejoining segments in order reproduces the lowercased token stream."""
    d = _docs(spark, [(0, "A b C d E f G h I"), (1, "x"), (2, "p q r")])
    segs = dedup.segment_word_lines(d, words_per_line=4)
    rows = sorted(
        (r["doc_id"], r["line_no"], r["line"]) for r in segs.collect()
    )
    joined = {}
    for doc, _, line in rows:
        joined[doc] = (joined.get(doc, "") + " " + line).strip()
    assert joined == {0: "a b c d e f g h i", 1: "x", 2: "p q r"}
    # widths: every segment but a doc's last has exactly words_per_line
    by_doc = {}
    for doc, no, line in rows:
        by_doc.setdefault(doc, []).append(line)
    for doc, lines in by_doc.items():
        for seg in lines[:-1]:
            assert len(seg.split(" ")) == 4
