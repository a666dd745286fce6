"""Query registry: one named entry per operator from SURVEY.md §2.

Each registered query couples (a) a Spark DataFrame callable
``(spark, sf_dir) -> DataFrame`` with (b) an equivalent ANSI-SQL oracle
string that DuckDB runs over the same parquet fixtures. The driver compares
row-count + schema + order-insensitive value hash, so every computed column
is aliased identically on both sides, and float aggregates are rounded the
same way on both sides to absorb accumulation-order differences.

Queries marked ``headline=True`` form the bench.py suite.
Queries with ``oracle=None`` are non-SQL-expressible (LSH internals,
streaming statefulness); the driver records a rows-only check and our own
pytest self-consistency asserts cover semantics.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from basic_data_pipeline_spark.caching import release_persisted

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    headline: bool
    doc: str


REGISTRY: dict[str, Query] = {}


def query(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name`` with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Release the PREVIOUS query's tracked persists (its consuming
            # action has completed by the time the next query is built) —
            # bounds cached blocks to one query's worth in any long-lived
            # session without cooperation from the external driver.
            release_persisted()
            return fn(spark, sf_dir)

        REGISTRY[name] = Query(
            name=name, fn=wrapped, oracle=oracle, headline=headline,
            doc=fn.__doc__ or "",
        )
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {q.name: q.fn for q in REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}


def headline_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {q.name: q.fn for q in REGISTRY.values() if q.headline}


_LOADED = False

# Canonical registration order. The external correctness gate records
# queries in registration order with a bounded budget (r1 recorded exactly
# the first 50 of 83), so the order is part of the contract: queries whose
# §2 families lacked r1 evidence lead, and the whole surface is kept ≤ 50
# entries by tag-union merging (see VERDICT.md r1, "Next round" #1).
# _reorder() raises if this list and the decorated queries ever drift.
#
# ORACLE-SLOT ROTATION (how new operators gain oracle coverage): the
# 50-slot budget is FULL — these names must never change (pinned by
# tests/test_registry_contract.py) and new slots cannot be added. A new
# operator gets driver-checked correctness by folding a BRANCH into an
# existing tag-union query: union more rows with a fresh `kind` tag onto
# a query whose output schema is already the generic
# (kind, key, value[, value2…]) shape, and extend its oracle SQL with
# the matching UNION ALL arm. The hash compare is order-insensitive and
# schema-stable under added branches, so this is always safe. Queries
# with PROVEN branch headroom (already multi-branch, generic schema —
# the r5-r7 precedents in parentheses):
#   dedup_exact_fp        (raw/fingerprint + line_* r6 + substr_* r7)
#   text_lang_token       (lang/token + psi r6 + lr r7 + dom*/dsir/
#                          blockphrase r8 + c4line/gopher/pplbucket/
#                          url/links/knlm r8 — REBALANCED r9: the six
#                          graph arms moved out (see below) after the
#                          slot hit 23 arms / ~80 s warm construction;
#                          its oracle is plain WITH again. DuckDB
#                          WITH RECURSIVE gotchas, wherever the scc arm
#                          lives: any top-level-set-op CTE is treated
#                          as recursive (plain UNION stops
#                          deduplicating: wrap as DISTINCT over UNION
#                          ALL) and plain CTEs re-inline per reference
#                          (mark multiply-referenced ones AS
#                          MATERIALIZED))
#   join_salted_skew      (tag union since r9: join + pagerank/hits/
#                          tri/core — the non-driver-loop graph arms,
#                          shared fixtures in queries/graph_ctes.py)
#   rollup_hourly_to_daily(also carries scc + lpa since r9 — the
#                          driver-loop graph arms; its oracle is the
#                          WITH RECURSIVE one now)
#   dedup_jaccard_truth   (pair/survivor + split r8 + winnow/hamband/
#                          hamming r8-close — the oracle side may even
#                          use WITH RECURSIVE, see the
#                          leakage-safe-splits arm)
#   corpus_pack_contam    (NOT kind-tagged but column-extensible: the r8
#                          contam_hits_bloom column proves a second
#                          computation path by emitting the same values
#                          the oracle derives once)
#   cdc_validate_dlq      (valid/dlq + profile/check r5)
#   cdc_schema_drift_union(union + diff r5)
#   cdc_delete_apply      (applied + scd2 r4)
#   join_range_cross      (theta/cross + binned r3 + fuzzy r5)
#   order_pick            (ordered + random_pick r3)
#   sim_topk_methods      (brute/blocked + bm25/rrf r8 + sq8/
#                          audiomatch r8-close — any new similarity,
#                          retrieval, or match strategy)
#   join_asof_union_window(asof + union-window arms)
# Single-purpose queries with FIXED domain-specific schemas (q1/q3/q5,
# window_*, agg_*, scan_filter_project, sql_direct_q6, multimodal_
# pipeline…) have NO headroom — don't try to graft branches onto them.
CANONICAL_ORDER: tuple[str, ...] = (
    # -- §2 families with no r1 oracle evidence first --
    "window_analytics",
    "set_ops_suite",
    "subquery_suite",
    "scalar_string_date_case",
    "scalar_math_json",
    "array_lateral_suite",
    "pivot_unpivot",
    "order_pick",
    "sql_direct_q6",
    "rollup_hourly_to_daily",
    "agg_salted_skew",
    "join_salted_skew",
    "join_asof_union_window",
    "stream_fixed_windows",
    "stream_session_late",
    # -- r1-green families (every §2 item keeps a representative) --
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "scan_filter_project",
    "join_flavors",
    "join_semi_anti",
    "join_broadcast_star",
    "join_range_cross",
    "join_asof_latest_event",
    "agg_core",
    "agg_approx_distinct",
    "agg_collect_sorted",
    "agg_multilevel",
    "agg_having",
    "topk_per_group",
    "window_rank_family",
    "cdc_envelope_decode",
    "cdc_compact_latest",
    "cdc_delete_apply",
    "cdc_normalize_values",
    "cdc_schema_drift_union",
    "cdc_validate_dlq",
    "text_doc_profile",
    "text_lang_token",
    "dedup_exact_fp",
    "dedup_jaccard_truth",
    "dedup_minhash_lsh",
    "dedup_lsh_verified",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "sim_topk_methods",
    "sim_ann_lsh",
    "sim_topk_ivf",
    "multimodal_pipeline",
    # round 5: sequence packing + decontamination (50th and final slot of
    # the driver's 50-query recording budget)
    "corpus_pack_contam",
)


# ---------------------------------------------------------------------------
# PER-ARM NONEMPTINESS CONTRACT (r9 verdict item #1). A tag-union slot can
# hash-match the oracle while one of its arms is EMPTY ON BOTH SIDES —
# two rounds of green certified a bm25 arm that computed nothing (the 0.5
# max-df cut emptied both engines, fixed r9), and writing this contract
# immediately exposed a second one: cdc_delete_apply's delete_apply arm
# had been empty at every sf since r4 (every fixture user has an error
# event; fixed by a selective tombstone predicate, cdc_queries.py).
#
# For each tag-union slot: (tag_column, {arm: min_rows at sf0.01}).
# `audit_arm_rows` asserts (a) every declared arm meets its floor,
# (b) NO UNDECLARED ARM APPEARS — an arm lands in the same commit as its
# contract row, and (c) the tag column exists. Slots absent here are
# single-shape; they carry the implicit total floor MIN_TOTAL_ROWS.
# Enforced by tests/test_arm_nonempty.py (runs the declared slots at
# sf0.01) and by every tools/compare.py drive (all 50 slots, from the
# already-collected rows — zero extra Spark work; ARM_AUDIT json per
# round). Floors are 1 — the contract is a vacuity guard, not a
# cardinality pin (exact values are the hash compare's job).
#
# NOT arms (data columns that look like tags): cdc_envelope_decode.op is
# the CDC operation column of the fixture stream (all 'c' at small sf) —
# payload, not a union branch; cdc_validate_dlq.table likewise names the
# profiled table.
# ---------------------------------------------------------------------------
MIN_TOTAL_ROWS = 1
ARM_CONTRACT: dict[str, tuple[str, dict[str, int]]] = {
    "agg_multilevel": ("src", {"cube": 1, "gsets": 1, "rollup": 1}),
    "array_lateral_suite": (
        "kind", {"first3": 1, "has_the": 1, "n_toks": 1, "n_uniq": 1, "tok": 1},
    ),
    "cdc_delete_apply": ("branch", {"delete_apply": 1, "scd2": 1}),
    "cdc_schema_drift_union": ("kind", {"diff": 1, "evolve": 1}),
    "cdc_validate_dlq": ("kind", {"check": 1, "dlq": 1, "profile": 1}),
    "dedup_exact_fp": (
        "kind",
        {"fingerprint": 1, "line_common": 1, "line_first": 1, "raw": 1,
         "substr": 1, "substr_span": 1},
    ),
    "dedup_jaccard_truth": (
        "kind",
        {"hamband": 1, "hamming": 1, "pair": 1, "split": 1, "survivor": 1,
         "winnow": 1},
    ),
    "join_flavors": ("flavor", {"full": 1, "inner": 1, "left": 1}),
    "join_range_cross": (
        "kind", {"binned": 1, "cross": 1, "fuzzy": 1, "theta": 1},
    ),
    "join_salted_skew": (
        "kind", {"core": 1, "hits": 1, "join": 1, "pagerank": 1, "tri": 1},
    ),
    "join_semi_anti": ("kind", {"anti": 1, "semi": 1}),
    "order_pick": ("kind", {"random_pick": 1, "sort50": 1}),
    "rollup_hourly_to_daily": (
        "branch",
        {"anom": 1, "daily": 1, "funnel": 1, "gfi": 1, "gfl": 1, "lpa": 1,
         "lttb": 1, "scc": 1, "sess": 1},
    ),
    "set_ops_suite": (
        "op",
        {"distinct": 1, "except": 1, "intersect": 1, "union_all": 1,
         "union_distinct": 1},
    ),
    "sim_topk_methods": (
        "method",
        {"audiomatch": 1, "blocked": 1, "bm25": 1, "brute": 1, "rrf": 1,
         "sq8": 1},
    ),
    "stream_fixed_windows": ("kind", {"sliding": 1, "tumbling": 1}),
    "stream_session_late": ("kind", {"late_kept": 1, "session": 1}),
    "text_lang_token": (
        "grp",
        {"blockphrase": 1, "c4line": 1, "domcap": 1, "domfilter": 1,
         "domstats": 1, "dsir": 1, "gopher": 1, "knlm": 1, "lang": 1,
         "links": 1, "lr": 1, "pplbucket": 1, "psi": 1, "rep2": 1,
         "rep3": 1, "tokbudget": 1, "tokens": 1, "url": 1},
    ),
}


def audit_arm_rows(name: str, cols: list[str], rows) -> list[str]:
    """Audit one slot's COLLECTED result against the nonemptiness
    contract; returns violation strings (empty = clean). Pure Python over
    rows a gate already collected — no extra Spark work."""
    problems: list[str] = []
    if len(rows) < MIN_TOTAL_ROWS:
        problems.append(f"{name}: {len(rows)} rows < floor {MIN_TOTAL_ROWS}")
    if name not in ARM_CONTRACT:
        return problems
    tag_col, floors = ARM_CONTRACT[name]
    if tag_col not in cols:
        return problems + [f"{name}: tag column {tag_col!r} missing from {cols}"]
    i = list(cols).index(tag_col)
    counts: dict[str, int] = {}
    for r in rows:
        counts[r[i]] = counts.get(r[i], 0) + 1
    for arm, floor in sorted(floors.items()):
        if counts.get(arm, 0) < floor:
            problems.append(
                f"{name}[{arm}]: {counts.get(arm, 0)} rows < floor {floor} "
                "— VACUOUS ARM (empty on both sides still hash-matches)"
            )
    # stringified sort: a None or non-string tag value alongside strings is
    # exactly the anomaly this audit should SURFACE — sorted() over the raw
    # mixed set would raise TypeError and crash the compare drive instead
    # (r10 ADVICE).
    undeclared = sorted(map(repr, set(counts) - set(floors)))
    if undeclared:
        problems.append(
            f"{name}: undeclared arms {undeclared} — an arm lands with its "
            "ARM_CONTRACT row in the same commit"
        )
    return problems


def _reorder() -> None:
    """Rebuild REGISTRY in CANONICAL_ORDER; fail loudly on drift."""
    names = set(REGISTRY)
    listed = set(CANONICAL_ORDER)
    if names != listed:
        missing = sorted(listed - names)
        extra = sorted(names - listed)
        raise RuntimeError(
            f"registry/CANONICAL_ORDER drift: missing={missing} extra={extra}"
        )
    ordered = {name: REGISTRY[name] for name in CANONICAL_ORDER}
    REGISTRY.clear()
    REGISTRY.update(ordered)


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imported here (not at module top) to avoid circular imports: the query
    # modules import `query` from this module.
    from basic_data_pipeline_spark.queries import cdc_queries  # noqa: F401
    from basic_data_pipeline_spark.queries import llm_queries  # noqa: F401
    from basic_data_pipeline_spark.queries import relational  # noqa: F401
    from basic_data_pipeline_spark.queries import scale_queries  # noqa: F401
    from basic_data_pipeline_spark.queries import streaming_queries  # noqa: F401

    _reorder()
    _LOADED = True
