"""BM25 retrieval + RRF fusion vs a serial pure-Python reference.

The oracle branches (sim_topk_methods[bm25,rrf]) prove cross-engine rank
agreement on the fixture; these tests pin the operator against an
independently-written in-memory BM25/RRF on adversarial mini-corpora
(ties, maxdf pruning, self-exclusion, empty queries) and assert the
partitioning-invariance the DECIMAL-sum design guarantees.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import retrieval


def _tok(s):
    return [t for t in re.split(r"\s+", s.lower()) if t]


def _r6(x: float) -> Decimal:
    # Spark F.round / DuckDB round: HALF_UP at 6 places (positive values)
    return Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def serial_bm25(docs, queries, k, k1=1.2, b=0.75, max_df_frac=None,
                exclude_self=False):
    """Independent in-memory BM25: dict-of-Counters, no Spark."""
    tf = {d: Counter(_tok(t)) for d, t in docs.items()}
    dl = {d: sum(c.values()) for d, c in tf.items()}
    n = len(docs)
    avgdl = sum(dl.values()) / n
    df = Counter(t for c in tf.values() for t in c)
    allowed = {
        t for t, f in df.items()
        if max_df_frac is None or f <= n * max_df_frac
    }
    out = {}
    for qid, qtext in queries.items():
        scores = {}
        for term in set(_tok(qtext)):
            if term not in df or term not in allowed:
                continue
            idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
            for d, c in tf.items():
                if term not in c:
                    continue
                if exclude_self and d == qid:
                    continue
                t = c[term]
                contrib = idf * (t * (k1 + 1.0)) / (
                    t + k1 * (1.0 - b + b * dl[d] / avgdl)
                )
                scores[d] = scores.get(d, Decimal(0)) + _r6(contrib)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [(d, r + 1) for r, (d, _) in enumerate(ranked)]
    return out


DOCS = {
    1: "spark shuffle join broadcast join",
    2: "spark window rank the the the",
    3: "the quick brown fox the",
    4: "shuffle shuffle shuffle skew salt",
    5: "broadcast dim table join spark",
    6: "  leading space   and   gaps ",
}
QUERIES = {10: "spark join shuffle", 11: "the fox", 12: "", 13: "zzz absent"}


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in DOCS.items()], "doc_id long, text string"
    ).repartition(5)
    qs = spark.createDataFrame(
        [(i, t) for i, t in QUERIES.items()],
        "query_id long, query_text string",
    )
    return docs, qs


def _ranks(df):
    return {
        qid: sorted(
            [(r["neighbor_id"], r["rank"]) for r in rows], key=lambda x: x[1]
        )
        for qid, rows in _group(df.collect()).items()
    }


def _group(rows):
    g = {}
    for r in rows:
        g.setdefault(r["query_id"], []).append(r)
    return g


def test_bm25_matches_serial_reference(frames):
    docs, qs = frames
    got = _ranks(retrieval.bm25_topk(docs, qs, 3))
    want = serial_bm25(DOCS, QUERIES, 3)
    want = {q: v for q, v in want.items() if v}
    assert got == want
    # query 12 (empty) and 13 (all-absent terms) produce no rows at all
    assert 12 not in got and 13 not in got


def test_bm25_maxdf_prunes_hot_terms(frames):
    docs, qs = frames
    # 'the' appears in 2/6 docs -> survives 0.5, dies at 0.25
    got = _ranks(retrieval.bm25_topk(docs, qs, 3, max_df_frac=0.25))
    want = serial_bm25(DOCS, QUERIES, 3, max_df_frac=0.25)
    want = {q: v for q, v in want.items() if v}
    assert got == want
    # and the pruning actually changed query 11's result set
    assert got.get(11) != _ranks(retrieval.bm25_topk(docs, qs, 3)).get(11)


def test_bm25_self_query_excluded(frames):
    docs, _ = frames
    qs = docs.select(
        F.col("doc_id").alias("query_id"),
        F.col("text").alias("query_text"),
    )
    got = _ranks(retrieval.bm25_topk(docs, qs, 3, exclude_self=True))
    want = serial_bm25(DOCS, {i: t for i, t in DOCS.items()}, 3,
                       exclude_self=True)
    want = {q: v for q, v in want.items() if v}
    assert got == want
    for qid, pairs in got.items():
        assert qid not in {d for d, _ in pairs}


def test_bm25_partitioning_invariant(frames):
    docs, qs = frames
    one = _ranks(retrieval.bm25_topk(docs.coalesce(1), qs, 4))
    many = _ranks(retrieval.bm25_topk(docs.repartition(7), qs, 4))
    assert one == many


def serial_rrf(lists, k, k_rrf=60):
    scores, votes = {}, {}
    for ranks in lists.values():
        for (q, d), r in ranks.items():
            key = (q, d)
            scores[key] = scores.get(key, Decimal(0)) + _r6(
                1.0 / (k_rrf + r)
            )
            votes[key] = votes.get(key, 0) + 1
    out = {}
    for q in {q for q, _ in scores}:
        ranked = sorted(
            ((d, s) for (qq, d), s in scores.items() if qq == q),
            key=lambda kv: (-kv[1], kv[0]),
        )[:k]
        out[q] = [(d, i + 1, votes[(q, d)]) for i, (d, _) in enumerate(ranked)]
    return out


def test_rrf_fuse_matches_serial(spark):
    a = {(1, 10): 1, (1, 11): 2, (1, 12): 3, (2, 20): 1}
    b = {(1, 11): 1, (1, 13): 2, (2, 21): 1, (2, 20): 2}
    mk = lambda d: spark.createDataFrame(
        [(q, n, r) for (q, n), r in d.items()],
        "query_id long, neighbor_id long, rank int",
    )
    got = retrieval.rrf_fuse({"a": mk(a), "b": mk(b)}, 3)
    got_m = {
        q: [(r["neighbor_id"], r["rank"], r["n_lists"]) for r in
            sorted(rows, key=lambda r: r["rank"])]
        for q, rows in _group(got.collect()).items()
    }
    assert got_m == serial_rrf({"a": a, "b": b}, 3)
    # 11 voted by both lists -> wins query 1; 20 wins query 2
    assert got_m[1][0] == (11, 1, 2)
    assert got_m[2][0] == (20, 1, 2)


def test_rrf_single_list_is_identity_ranking(spark):
    a = {(1, 10): 1, (1, 11): 2, (1, 12): 3}
    df = spark.createDataFrame(
        [(q, n, r) for (q, n), r in a.items()],
        "query_id long, neighbor_id long, rank int",
    )
    got = retrieval.rrf_fuse({"only": df}, 2).collect()
    assert [(r["neighbor_id"], r["rank"]) for r in
            sorted(got, key=lambda r: r["rank"])] == [(10, 1), (11, 2)]
    with pytest.raises(ValueError):
        retrieval.rrf_fuse({}, 2)


def test_bm25_plan_broadcasts_query_side(frames):
    """The postings scan must be pruned via broadcast joins on the query
    terms — a shuffle join on term for a bounded query batch would ship
    the whole postings list."""
    docs, qs = frames
    plan = retrieval.bm25_topk(docs, qs, 3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_rank_metrics_against_brute_force(spark):
    """recall@k / MRR@k vs a hand-computed reference, including a query
    the retriever missed entirely (zero row convention) and truth lists
    longer than k (denominator caps at k)."""
    results = spark.createDataFrame(
        [
            (1, 101, 1), (1, 102, 2), (1, 103, 3),
            (2, 201, 1), (2, 999, 2),
            # query 3 returns nothing
            (4, 401, 1), (4, 402, 2), (4, 403, 3), (4, 404, 4),
        ],
        "query_id long, neighbor_id long, rank int",
    )
    truth = spark.createDataFrame(
        [
            (1, 102), (1, 103),            # both found at ranks 2,3
            (2, 202),                      # missed
            (3, 301),                      # no results at all
            (4, 401), (4, 402), (4, 403), (4, 404),  # 4 truths, k=3
        ],
        "query_id long, neighbor_id long",
    )
    got = {
        r["query_id"]: (r["n_truth"], r["hits"], r["recall"], r["mrr"])
        for r in retrieval.rank_metrics(results, truth, 3).collect()
    }
    assert got[1] == (2, 2, 1.0, 0.5)
    assert got[2] == (1, 0, 0.0, 0.0)
    assert got[3] == (1, 0, 0.0, 0.0)   # absent query still reported
    assert got[4][:2] == (4, 3)
    assert abs(got[4][2] - 1.0) < 1e-12  # denominator caps at k
    assert got[4][3] == 1.0


def test_mine_hard_negatives_drops_positives_and_reranks(spark):
    results = spark.createDataFrame(
        [
            (1, 101, 1), (1, 102, 2), (1, 103, 3), (1, 104, 4),
            (2, 201, 1), (2, 202, 2),
        ],
        "query_id long, neighbor_id long, rank int",
    )
    positives = spark.createDataFrame(
        [(1, 101), (1, 103), (2, 999)],
        "query_id long, neighbor_id long",
    )
    got = {
        (r["query_id"], r["neighbor_id"]): r["neg_rank"]
        for r in retrieval.mine_hard_negatives(
            results, positives, 2
        ).collect()
    }
    # q1: 101/103 are positives -> negatives are 102 (1st), 104 (2nd)
    # q2: no positives retrieved -> 201, 202 keep their order
    assert got == {(1, 102): 1, (1, 104): 2, (2, 201): 1, (2, 202): 2}
