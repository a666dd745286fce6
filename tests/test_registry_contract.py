"""The 50-query oracle contract is FROZEN: the driver records exactly
the first 50 registered queries by name, in registration order, and its
round-over-round history keys on those names. Renaming, removing, or
reordering any of them silently breaks the correctness-gate continuity —
new operators must fold into existing tag-union queries instead (see the
ORACLE-SLOT ROTATION note in registry.py)."""

from __future__ import annotations

from basic_data_pipeline_spark import registry

# The frozen contract, verbatim. A failure here means someone changed a
# registered query name — revert it, or consciously update BOTH this
# list and registry.CANONICAL_ORDER knowing the driver history resets
# for that slot.
FROZEN_50 = (
    "window_analytics", "set_ops_suite", "subquery_suite",
    "scalar_string_date_case", "scalar_math_json", "array_lateral_suite",
    "pivot_unpivot", "order_pick", "sql_direct_q6",
    "rollup_hourly_to_daily", "agg_salted_skew", "join_salted_skew",
    "join_asof_union_window", "stream_fixed_windows", "stream_session_late",
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "scan_filter_project", "join_flavors", "join_semi_anti",
    "join_broadcast_star", "join_range_cross", "join_asof_latest_event",
    "agg_core", "agg_approx_distinct", "agg_collect_sorted",
    "agg_multilevel", "agg_having", "topk_per_group", "window_rank_family",
    "cdc_envelope_decode", "cdc_compact_latest", "cdc_delete_apply",
    "cdc_normalize_values", "cdc_schema_drift_union", "cdc_validate_dlq",
    "text_doc_profile", "text_lang_token", "dedup_exact_fp",
    "dedup_jaccard_truth", "dedup_minhash_lsh", "dedup_lsh_verified",
    "dedup_simhash_pairs", "dedup_embedding_cosine", "sim_topk_methods",
    "sim_ann_lsh", "sim_topk_ivf", "multimodal_pipeline",
    "corpus_pack_contam",
)


def test_canonical_order_is_the_frozen_50():
    assert registry.CANONICAL_ORDER == FROZEN_50
    assert len(FROZEN_50) == 50


def test_registered_queries_match_and_keep_order():
    qs = registry.queries()
    assert tuple(qs) == FROZEN_50
    # every oracle key is a registered name (no orphans)
    assert set(registry.oracle_sql()) <= set(FROZEN_50)
