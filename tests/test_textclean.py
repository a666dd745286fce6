"""C4 line cleaning, Gopher quality rules, CCNet score buckets
(operators/text.py c4_line_clean / gopher_quality_flags,
operators/selection.py score_buckets) — each pinned against a serial
Python reference on hand-built fixtures."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import selection, text


DOCS = [
    # (doc_id, text) — newline-structured documents exercising every rule
    (0, "This line is long enough to keep.\nshort line.\n"
        "no terminal punctuation here at all\n"
        "Another properly terminated sentence stays in!\n"
        "Is this a kept question line too?"),
    (1, "Enable javascript to view this page properly.\n"
        "We value your privacy and our cookie policy applies here.\n"
        "A real sentence that should survive the cleaning stage."),
    (2, "function f() { return 1; }\n"
        "A fine sentence that would otherwise be kept here."),
    (3, "Lorem ipsum dolor sit amet consectetur adipiscing elit.\n"
        "A perfectly good sentence follows the placeholder text."),
    (4, "One good sentence that satisfies every line rule nicely.\n"
        "Two good sentences that satisfy every line rule nicely.\n"
        "Three good sentences that satisfy every line rule nicely."),
    (5, '"A quoted line counts as terminated."'),
]


def _serial_c4(doc, min_words=5, min_kept=3):
    lines = doc.split("\n")
    kept = []
    for ln in lines:
        t = ln.strip()
        low = t.lower()
        if not re.search(r'[.!?"]$', t):
            continue
        if len(re.split(r"\s+", t)) < min_words:
            continue
        if any(m in low for m in text.C4_BAD_LINE_MARKERS):
            continue
        kept.append(t if t == ln else ln)  # operator keeps the RAW line
    keep_doc = len(kept) >= min_kept and not any(
        m in doc.lower() for m in text.C4_BAD_DOC_MARKERS
    )
    return len(lines), len(kept), keep_doc


@pytest.fixture(scope="module")
def cdf(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    cols = text.c4_line_clean(F.col("text"))
    return {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *[c.alias(n) for n, c in cols.items()]
        ).collect()
    }


def test_c4_line_counts_match_serial(cdf):
    for doc_id, doc in DOCS:
        n_lines, n_kept, keep_doc = _serial_c4(doc)
        r = cdf[doc_id]
        assert r["n_lines"] == n_lines, doc_id
        assert r["n_kept"] == n_kept, doc_id
        assert r["keep_doc"] == keep_doc, doc_id


def test_c4_specific_rules(cdf):
    # doc 0: 3 of 5 lines keepable (terminated + >=5 words)
    assert cdf[0]["n_kept"] == 3 and cdf[0]["keep_doc"]
    # doc 1: javascript + cookie-policy lines dropped, 1 survivor < 3
    assert cdf[1]["n_kept"] == 1 and not cdf[1]["keep_doc"]
    # doc 2: '{' kills the doc regardless of line survivors
    assert not cdf[2]["keep_doc"]
    # doc 3: lorem ipsum kills the doc
    assert not cdf[3]["keep_doc"]
    # doc 5: quote is terminal punctuation
    assert cdf[5]["n_kept"] == 1


def test_c4_cleaned_is_joined_kept_lines(cdf):
    assert cdf[4]["cleaned"].count("\n") == 2
    assert cdf[4]["n_kept"] == 3
    for part in cdf[4]["cleaned"].split("\n"):
        assert part.rstrip().endswith(".")


GOPHER_DOCS = [
    (0, " ".join(["word"] * 60) + " the of"),          # all rules pass
    (1, " ".join(["word"] * 10)),                      # too few words
    (2, " ".join(["w"] * 60) + " the of"),             # mean len < 3
    (3, " ".join(["word"] * 55) + " " + " ".join(["###"] * 9)),  # symbols
    (4, "\n".join(["- bullet line"] * 10)
        + "\nplain the of " + " ".join(["word"] * 50)),  # bullets ok (10/11)
    (5, " ".join(["123"] * 60) + " the of"),           # alpha ratio fails
    (6, " ".join(["word"] * 60)),                      # no stopwords
]


@pytest.fixture(scope="module")
def gdf(spark):
    df = spark.createDataFrame(GOPHER_DOCS, "doc_id long, text string")
    cols = text.gopher_quality_flags(F.col("text"))
    out = df.select(
        "doc_id",
        *[c.alias(n) for n, c in cols.items()],
        text.gopher_rule_mask(F.col("text")).alias("mask"),
    )
    return {r["doc_id"]: r for r in out.collect()}


def test_gopher_rules_fire_individually(gdf):
    assert all(
        gdf[0][k] for k in gdf[0].asDict() if k.endswith("_ok")
    )
    assert not gdf[1]["word_count_ok"]
    assert not gdf[2]["mean_word_len_ok"]
    assert not gdf[3]["symbol_ratio_ok"]
    assert not gdf[5]["alpha_ratio_ok"]
    assert not gdf[6]["stopwords_ok"]


def test_gopher_measures_match_serial(gdf):
    for doc_id, doc in GOPHER_DOCS:
        toks = re.split(r"\s+", doc.lower())
        toks = [t for t in toks if t]  # split never yields '' mid-doc here
        r = gdf[doc_id]
        assert r["n_words"] == len(re.split(r"\s+", doc.lower()))
        alpha = sum(
            1 for t in re.split(r"\s+", doc.lower()) if re.search("[a-z]", t)
        ) / len(re.split(r"\s+", doc.lower()))
        assert r["alpha_word_ratio"] == pytest.approx(alpha)


def test_gopher_mask_packs_flags(gdf):
    names = [
        "word_count_ok", "mean_word_len_ok", "symbol_ratio_ok",
        "bullet_ratio_ok", "ellipsis_ratio_ok", "alpha_ratio_ok",
        "stopwords_ok",
    ]
    for doc_id, _ in GOPHER_DOCS:
        want = sum(1 << i for i, n in enumerate(names) if gdf[doc_id][n])
        assert gdf[doc_id]["mask"] == want


def test_score_buckets_ccnet_terciles(spark):
    rows = [(i, "en" if i % 2 == 0 else "de", float(i)) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, ppl double")
    out = selection.score_buckets(df, "ppl", "lang", "doc_id").collect()
    by = {(r["lang"], r["bucket_label"]): [] for r in out}
    for r in out:
        by[(r["lang"], r["bucket_label"])].append(r["doc_id"])
    # 6 docs per lang -> 2 per tercile; head = lowest perplexity
    assert sorted(by[("en", "head")]) == [0, 2]
    assert sorted(by[("en", "middle")]) == [4, 6]
    assert sorted(by[("en", "tail")]) == [8, 10]
    assert sorted(by[("de", "head")]) == [1, 3]


def test_score_buckets_deterministic_under_ties(spark):
    rows = [(i, "en", 1.0) for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, ppl double")
    a = {
        r["doc_id"]: r["bucket"]
        for r in selection.score_buckets(df, "ppl", "lang", "doc_id").collect()
    }
    b = {
        r["doc_id"]: r["bucket"]
        for r in selection.score_buckets(
            df.repartition(7), "ppl", "lang", "doc_id"
        ).collect()
    }
    assert a == b
    # NTILE floor-division sizing: 9 rows / 3 buckets = 3 each, id order
    assert [a[i] for i in range(9)] == [1, 1, 1, 2, 2, 2, 3, 3, 3]


def test_score_buckets_label_validation(spark):
    df = spark.createDataFrame([(1, "en", 1.0)], "doc_id long, lang string, s double")
    with pytest.raises(ValueError):
        selection.score_buckets(df, "s", "lang", "doc_id", n_buckets=4)
