"""Physical-plan assertions: the scale properties the queries claim
(pushdown, broadcasts, bounded shuffle counts) must survive refactors.
Complements tests/test_relational.py's pushdown checks with the merged
round-2 queries. Plans are inspected via explain(mode="formatted") text —
the same artifact a human audit reads.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from basic_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = registry.queries()[name](spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_scan_filter_project_pushes_every_predicate(spark):
    plan = _plan(spark, "scan_filter_project")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, plan
    line = pushed[0]
    for frag in (
        "GreaterThanOrEqual(o_totalprice",
        "LessThanOrEqual(o_totalprice",
        "In(o_orderstatus",
        "StringStartsWith(o_orderpriority",
        "IsNotNull(o_orderdate)",
    ):
        assert frag in line, f"missing pushed predicate {frag}:\n{line}"


def test_window_analytics_single_data_shuffle(spark):
    """Every window frame shares the user_id partition: exactly ONE
    exchange (plus none for output — the global sort was removed as a
    scale anti-pattern)."""
    plan = _plan(spark, "window_analytics")
    exchanges = [
        ln
        for ln in plan.splitlines()
        if ln.strip().startswith("(") and ") Exchange" in ln
    ]
    assert len(exchanges) == 1, plan


def test_q5_broadcasts_all_dimensions(spark):
    plan = _plan(spark, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 3, plan  # supplier/nation/region


def test_asof_union_window_is_joinless(spark):
    """The linear as-of form: union + ONE window shuffle on user_id (plus
    the query's own purchases pre-aggregation exchange). The property that
    beats the range-join+row_number form at scale: NO join operator at
    all — no per-key pair materialization to explode on hot keys."""
    plan = _plan(spark, "join_asof_union_window")
    exchanges = [
        ln
        for ln in plan.splitlines()
        if ln.strip().startswith("(") and ") Exchange" in ln
    ]
    assert len(exchanges) <= 2, plan
    assert plan.count(") Window") == 1, plan
    assert "Join" not in plan, plan


def test_multimodal_pipeline_is_arrow_python(spark):
    """The ONLY sanctioned Python hot path: exactly one Arrow mapInPandas
    stage, no row-at-a-time Python UDFs anywhere in the plan."""
    plan = _plan(spark, "multimodal_pipeline")
    assert "MapInPandas" in plan, plan
    assert "BatchEvalPython" not in plan, plan  # row-at-a-time python UDF


def test_no_cartesian_products_in_merged_queries(spark):
    for name in (
        "join_flavors",
        "join_semi_anti",
        "agg_multilevel",
        "set_ops_suite",
        "subquery_suite",
        "scalar_math_json",
    ):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, f"{name}:\n{plan}"


def test_pq_encode_broadcasts_codebook_no_single_partition(spark):
    """PQ encoding must broadcast the (m x k_codes)-row codebook and keep
    the per-vector work distributed — no single-partition exchange."""
    from pyspark.sql import functions as F

    from basic_data_pipeline_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    book = similarity.pq_train(emb, dim=64, m=8, k_codes=16, iters=0)
    enc = similarity.pq_encode(emb, book, dim=64, m=8)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_scd2_apply_no_global_sort(spark):
    """SCD2's windows partition by key — no global sort / single-partition
    funnel may appear when folding a batch into a history."""
    from basic_data_pipeline_spark.operators.scd import scd2_apply

    ch = spark.createDataFrame(
        [(1, "a", 1, "c"), (2, "b", 2, "c"), (1, "a2", 3, "u")],
        "id long, v string, ts long, op string",
    )
    hist = scd2_apply(None, ch, ["id"])
    out = scd2_apply(hist, ch.withColumn("ts", ch.ts + 10), ["id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan


def test_corpus_pack_contam_no_single_partition(spark):
    """The packing query's prefix sum must stay distributed end to end."""
    plan = _plan(spark, "corpus_pack_contam")
    assert "Exchange SinglePartition" not in plan, plan


def test_ivfpq_self_search_never_broadcasts_query_side(spark):
    """In the self-search convention the queries ARE the corpus, so the
    ADC table (n_vectors x nprobe x m x k_codes rows) is query-
    proportional and must never be broadcast — at 10^9 vectors that hint
    is a guaranteed OOM. With auto-broadcast disabled every
    BroadcastExchange left in the plan comes from an explicit hint:
    assert the (cell, j, code) ADC join is a shuffle join and no
    broadcast node carries a cell key (the only sanctioned hints are the
    codebook / centroid tables, which join on j / crossJoin)."""
    import re

    from basic_data_pipeline_spark.operators import similarity

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        res = similarity.ivfpq_search(
            emb, dim=64, k=3, nprobe=2, train_iters=1, shortlist=20
        )
        plan = res._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert re.search(r"SortMergeJoin \[cell#", plan), plan
    for ln in plan.splitlines():
        if "BroadcastHashJoin" in ln:
            assert "cell#" not in ln, ln
