"""Plan-shape regression guard for every headline query.

Pins (shuffle exchanges, broadcast exchanges, Python evals, nested-loop
joins) per headline plan. Perf regressions usually arrive as an extra
Exchange (a lost co-partitioning), a broadcast silently becoming a
shuffle, Python sneaking onto a hot path, or a join degenerating to a
nested loop — all visible in the plan BEFORE any timing moves. A
legitimate plan change (new branch in a merged query, optimizer upgrade)
updates the table consciously in review, which is the point.

Counts taken at sf0.001 with 8 shuffle partitions (conftest session
settings); AQE leaves the initial plan's exchange structure intact at
this stage, so the counts are stable run to run.
"""

from __future__ import annotations

import pytest

from basic_data_pipeline_spark.registry import headline_queries

SF_DIR = "/root/testdata/sf0.001"

# (shuffle exchanges, broadcast exchanges, python evals, nested-loop joins)
EXPECTED = {
    "window_analytics": (1, 0, 0, 0),
    "agg_salted_skew": (3, 1, 0, 0),
    "join_asof_union_window": (2, 0, 0, 0),
    "stream_fixed_windows": (2, 0, 0, 0),
    # the nested-loop here is the 1-row late-cutoff scalar broadcast
    # (ts >= cutoff) — a bounded build side by construction
    "stream_session_late": (3, 1, 0, 1),
    "q1_pricing_summary": (3, 0, 0, 0),
    "q3_shipping_priority": (1, 2, 0, 0),
    "q5_local_supplier_volume": (2, 5, 0, 0),
    "cdc_compact_latest": (1, 0, 0, 0),
    "text_doc_profile": (2, 0, 0, 0),
    "dedup_minhash_lsh": (3, 1, 0, 0),
    # r8: jaccard_verify prunes the shingle frame to candidate
    # PARTICIPANTS (one semi-join on the candidate id set) before the
    # intersection join — the corpus-shuffle fix measured at the 64×
    # perturbed tier (SCALING.md round 8: verify stage 52→9.5 s,
    # per-4× 6.6→3.7). The count jump is TEXTUAL, not executed: the
    # candidates and pruned-shingle frames are tracked_persist'd and
    # consumed at 5 sites, and toString() reprints each cached
    # subtree's full build plan under every InMemoryRelation (31 print
    # sites). Python evals and nested loops stay 0, which is what this
    # pin chiefly guards; the runtime exchange count is the cache-build
    # plans' once each.
    # r11 persisted the distinct shingle frame; r12 REVERTED it (the
    # driver's bench measured the cache build as a serialization
    # barrier: median 1.94 -> 2.57 s; interleaved A/B confirmed at 8
    # cores) — the textual exchange count falls back with the removed
    # cached-subtree reprints while the shingle pipeline again runs as
    # two concurrent branches.
    "dedup_lsh_verified": (42, 13, 0, 0),
    # promoted to headline in r7 with the substr/substr_span branches:
    # 6 tag-unioned dedup granularities (doc raw/fingerprint, line
    # common/first, substring kept/span-checksum) — the shuffles are the
    # per-branch keyed aggs + the gram/line stats joins; broadcasts are
    # AQE-sized stats sides at sf0.001
    # r11 persisted ONE duplicate_spans frame for both substring arms;
    # r12 REVERTED it (driver bench median 2.67 -> 4.14 s; interleaved
    # A/B: persisting loses at 32 AND 8 cores) — textual count -2 with
    # the removed cached-subtree reprint; the segment-lines persist
    # (which A/B'd as a WIN) remains.
    "dedup_exact_fp": (12, 5, 0, 0),
    # the nested-loop is the sanctioned brute-force baseline branch
    # (5 query vectors crossed against the corpus)
    # r8: + bm25 and rrf branches. The nested-loops are (a) the
    # sanctioned 5-query brute-force cross join, printed twice because
    # brute_ranks also feeds the rrf fusion, and (b) the 1-row corpus-
    # stats broadcast cross joins inside bm25 (maxdf prune + scoring),
    # likewise printed twice (bm25 branch + rrf input) — every build
    # side is ≤ 1 row or ≤ |queries| by construction. Shuffles are the
    # postings/df/score keyed aggs + per-branch top-k windows across
    # the four branches' print sites. Python evals stay 0.
    # r8-close: + the sq8 branch. Its 3 extra nested-loops are the
    # 1-row (lo_arr, hi_arr) model broadcast cross joins (encode +
    # decode) and the 5-query ADC cross join — all build sides <= 5
    # rows by construction. The extra shuffles are the posexplode
    # groupBy(d) fit agg + the dim-row collect_list fold, printed at
    # both model consumption sites (encode and decode recompute
    # _sq8_arrays; at fixture scale a non-issue, at production scale
    # callers persist the 1-row model frame).
    # r8-close: +8 exchanges/+3 broadcasts from the audiomatch branch
    # (fhash self-join, offset-vote groupBy, best-offset window over a
    # 1024-row synthetic constellation — reviewed, all bounded)
    # r11: the SQ8 model (dim rows) is tracked_persist'd — encode and
    # decode each fold it via _sq8_arrays, so the posexplode min/max fit
    # over every vector runs once, not twice (measured a wash at sf0.1
    # where stage latency dominates; at scale it halves the full-table
    # fit passes). Persisting brute_ranks/bm25_ranks for the rrf arm was
    # TRIED AND REVERTED: the cache build serializes the plan and drops
    # AQE inside the cached subtree, measured +0.8 s at sf0.1 on 32 AND
    # 8 cores — duplicated rank pipelines run concurrently and win.
    # r12: the r11 spread-docs persist is REVERTED (the round's biggest
    # driver-measured regression, median 3.71 -> 8.26 s; interleaved
    # A/B median 5.74 persisted vs 3.33 not at 32 cores) — the three
    # consumers re-scan concurrently. bm25_topk is now a SINGLE-PASS
    # contribution join: df aggregates over the query-pruned postings
    # and joins back on the same key (one reused exchange) instead of a
    # full-vocabulary aggregate shipped via its own broadcast-build
    # job; the df join side leaves the broadcast set (-1 per print
    # site) while the query-term prune adds a bounded broadcast
    # (+1 per site) and the persist reverts rebalance the rest:
    # exchanges stay 48 textually, broadcasts 19 -> 21 — every build
    # side still <= |query terms| or 1 row; python evals stay 0.
    "sim_topk_methods": (48, 21, 0, 9),
    "sim_ann_lsh": (4, 3, 0, 0),
    # r8: + the Bloom-prefiltered contamination arm (contam_hits_bloom):
    # its shingle agg + verify join + outer join add 3 shuffles and 2
    # broadcasts of benchmark-sized sides; the Bloom probe itself is
    # codegen (python evals and nested loops stay 0 — the pin's chief
    # guard)
    # r11: the exact and Bloom contamination paths now share ONE
    # persisted corpus-shingle frame and ONE persisted bench-stats frame
    # (they must stay separate computations — the hash gate proves the
    # prefilter lossless — but their inputs are identical). Broadcasts
    # 5 → 3 (the bench side broadcasts once per path from cache);
    # textual exchanges rise with the two cached subtrees' reprints.
    "corpus_pack_contam": (16, 3, 0, 0),
}


def _fingerprint(plan: str) -> tuple[int, int, int, int]:
    return (
        plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange SinglePartition"),
        plan.count("BroadcastExchange"),
        plan.count("EvalPython") + plan.count("MapInPandas"),
        plan.count("CartesianProduct") + plan.count("BroadcastNestedLoopJoin"),
    )


def test_every_headline_query_is_pinned():
    assert set(EXPECTED) == set(headline_queries())


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_headline_plan_fingerprint(name, spark):
    fn = headline_queries()[name]
    plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    got = _fingerprint(plan)
    assert got == EXPECTED[name], (
        f"{name}: plan shape drifted {EXPECTED[name]} -> {got}. If the"
        " change is intentional (new branch, optimizer upgrade), update"
        " EXPECTED after reviewing the new plan; if not, a shuffle/"
        "broadcast/python/nested-loop regression just tried to land."
    )
