"""Domain curation operators: per-domain capping (exactness, salt
invariance, partitioning invariance), domain stats, broadcast
blocklist/allowlist filtering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import domains


@pytest.fixture(scope="module")
def docs(spark):
    # 3 domains with deliberately skewed sizes: big=40, mid=7, tiny=2.
    rows = []
    i = 0
    for dom, n in (("big.example", 40), ("mid.example", 7), ("tiny.org", 2)):
        for _ in range(n):
            rows.append((i, dom, f"text {i}", ["en", "de"][i % 2], 10 + i))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string, lang string, n_chars long"
    )


def _brute_cap(df, cap):
    """Driver-side reference: cap smallest xxhash64(doc_id) per source."""
    ranked = df.select(
        "source", "doc_id", F.xxhash64("doc_id").alias("h")
    ).collect()
    by_dom = {}
    for r in ranked:
        by_dom.setdefault(r.source, []).append((r.h, r.doc_id))
    keep = set()
    for vals in by_dom.values():
        for _, d in sorted(vals)[:cap]:
            keep.add(d)
    return keep


def test_cap_matches_brute_force(docs):
    for cap in (1, 5, 100):
        got = {
            r.doc_id
            for r in domains.domain_cap(docs, "source", cap).collect()
        }
        assert got == _brute_cap(docs, cap), cap


def test_cap_salt_invariant(docs):
    """Any salt_buckets value returns the identical kept set (pass 1
    only drops rows already beaten by >= cap same-bucket rows)."""
    base = {
        r.doc_id
        for r in domains.domain_cap(docs, "source", 5, salt_buckets=1).collect()
    }
    for s in (2, 8, 64):
        got = {
            r.doc_id
            for r in domains.domain_cap(
                docs, "source", 5, salt_buckets=s
            ).collect()
        }
        assert got == base, s


def test_cap_partitioning_invariant(docs):
    base = {r.doc_id for r in domains.domain_cap(docs, "source", 3).collect()}
    for parts in (1, 7):
        got = {
            r.doc_id
            for r in domains.domain_cap(
                docs.repartition(parts), "source", 3
            ).collect()
        }
        assert got == base, parts


def test_cap_identity_when_under_cap(docs):
    out = domains.domain_cap(docs, "source", 1000)
    assert out.count() == docs.count()
    assert out.columns == docs.columns  # full rows survive the semi-join


def test_cap_zero_and_bad_args(docs):
    assert domains.domain_cap(docs, "source", 0).count() == 0
    with pytest.raises(ValueError):
        domains.domain_cap(docs, "source", -1)
    with pytest.raises(ValueError):
        domains.domain_cap(docs, "source", 1, salt_buckets=0)


def test_cap_ranked_ranks_are_global(docs):
    """Salted two-phase ranks == unsalted global within-domain ranks."""
    unsalted = {
        (r.domain, r.doc_id): r.rank
        for r in domains.domain_cap_ranked(
            docs, "source", 4, salt_buckets=1
        ).collect()
    }
    salted = {
        (r.domain, r.doc_id): r.rank
        for r in domains.domain_cap_ranked(
            docs, "source", 4, salt_buckets=8
        ).collect()
    }
    assert salted == unsalted
    per_dom = {}
    for (dom, _), rk in salted.items():
        per_dom.setdefault(dom, []).append(rk)
    for dom, rks in per_dom.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), dom


def test_custom_rank_key(docs):
    """rank_key overrides the hash: smallest doc_id per domain."""
    out = domains.domain_cap(
        docs, "source", 1, rank_key=F.col("doc_id")
    ).collect()
    assert {r.doc_id for r in out} == {0, 40, 47}


def test_domain_stats(docs):
    got = {
        r.domain: (r.n_docs, r.total_size, r.mean_size, r.n_langs)
        for r in domains.domain_stats(docs, "source").collect()
    }
    # tiny.org: ids 47,48 -> n_chars 57,58
    assert got["tiny.org"] == (2, 115, 115 / 2, 2)
    assert got["big.example"][0] == 40
    assert got["mid.example"][0] == 7
    assert sum(v[1] for v in got.values()) == sum(
        10 + i for i in range(49)
    )


def test_domain_filter_block_and_allow(spark, docs):
    block = domains.domains_from_values(spark, ["big.example"])
    out = domains.domain_filter(docs, "source", blocklist=block)
    assert {r.source for r in out.select("source").distinct().collect()} == {
        "mid.example",
        "tiny.org",
    }
    allow = domains.domains_from_values(spark, ["tiny.org", "nope.net"])
    out2 = domains.domain_filter(docs, "source", allowlist=allow)
    assert out2.count() == 2
    both = domains.domain_filter(
        docs, "source", blocklist=block, allowlist=allow
    )
    assert both.count() == 2
    with pytest.raises(ValueError):
        domains.domain_filter(docs, "source")


def test_domain_filter_broadcasts(spark, docs):
    """The list side must broadcast — the corpus side never shuffles."""
    block = domains.domains_from_values(spark, ["big.example"])
    plan = (
        domains.domain_filter(docs, "source", blocklist=block)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --- phrase blocklist ------------------------------------------------------

_PB_DOCS = [
    (1, "buy cheap pills now buy cheap pills"),
    (2, "a a a b"),
    (3, "perfectly clean document about gardening"),
    (4, "Buy   CHEAP pills and more"),
    (5, ""),
    (6, "cheap"),
]
_PB_PHRASES = ["buy cheap pills", "a a", "cheap"]


def _pb_frames(spark):
    d = spark.createDataFrame(_PB_DOCS, "doc_id long, text string")
    p = spark.createDataFrame([(x,) for x in _PB_PHRASES], "phrase string")
    return d, p


def _brute_hits():
    out = {}
    for did, t in _PB_DOCS:
        w = [x for x in t.lower().split() if x]
        for ph in _PB_PHRASES:
            pw = ph.lower().split()
            n = sum(
                1
                for i in range(len(w) - len(pw) + 1)
                if w[i : i + len(pw)] == pw
            )
            if n:
                out[(did, " ".join(pw))] = n
    return out


@pytest.mark.parametrize("use_bloom", [False, True])
def test_phrase_hits_match_brute_force(spark, use_bloom):
    """Multi-length phrases, overlapping occurrences ('a a a' holds
    'a a' twice), whitespace/case normalization, empty docs — counts
    must equal the sliding-window reference, with and without the Bloom
    prefilter (identical by construction)."""
    d, p = _pb_frames(spark)
    got = {
        (r["doc_id"], r["phrase"]): r["n_hits"]
        for r in domains.phrase_blocklist_hits(
            d, p, use_bloom=use_bloom
        ).collect()
    }
    assert got == _brute_hits() and got


def test_phrase_filter_drops_exactly_hit_docs(spark):
    d, p = _pb_frames(spark)
    kept = {
        r["doc_id"]
        for r in domains.phrase_blocklist_filter(d, p).collect()
    }
    hit_ids = {did for (did, _) in _brute_hits()}
    assert kept == {did for did, _ in _PB_DOCS} - hit_ids
    assert 3 in kept and 5 in kept


def test_phrase_empty_blocklist_raises(spark):
    d, _ = _pb_frames(spark)
    p = spark.createDataFrame([("   ",)], "phrase string")
    with pytest.raises(ValueError, match="empty"):
        domains.phrase_blocklist_hits(d, p)


def test_phrase_join_broadcasts_list_side(spark):
    d, p = _pb_frames(spark)
    plan = (
        domains.phrase_blocklist_hits(d, p)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
