"""Relational-core checks at sf0.001: every registered query runs, returns a
stable schema, and spot semantics hold. Full value-level verification against
DuckDB runs via tools/compare.py (and the driver's oracle gate at sf0.01);
these tests are the fast inner loop.
"""

from __future__ import annotations

import duckdb
import pytest

from basic_data_pipeline_spark import TABLES, registry
from tests.conftest import SF_SMOKE


@pytest.mark.slow
def test_all_queries_run_and_have_columns(spark):
    qs = registry.queries()
    assert len(qs) >= 40
    for name, fn in qs.items():
        df = fn(spark, SF_SMOKE)
        assert df.columns, f"{name} returned no columns"


def test_oracle_sql_is_valid_duckdb(tmp_path):
    """Every oracle string parses and runs in DuckDB at sf0.001."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    for name, sql in registry.oracle_sql().items():
        con.execute(sql).fetchall()


def test_flagship_q1(spark):
    df = registry.queries()["q1_pricing_summary"](spark, SF_SMOKE)
    rows = df.collect()
    assert 0 < len(rows) <= 6  # at most |returnflag|×|linestatus|
    r = {(x["l_returnflag"], x["l_linestatus"]): x for x in rows}
    total = sum(x["count_order"] for x in rows)
    assert total > 0
    for x in rows:
        assert x["sum_disc_price"] <= x["sum_base_price"]
        assert x["sum_charge"] >= x["sum_disc_price"]


def test_broadcast_star_plan_has_broadcast(spark):
    """join_broadcast_star must actually broadcast the dimensions."""
    df = registry.queries()["join_broadcast_star"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q1_scan_prunes_columns(spark):
    """The flagship scan must not read all 11 lineitem columns."""
    df = registry.queries()["q1_pricing_summary"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("FileScan") :]
    read_schema = scan[scan.index("ReadSchema") : scan.index("ReadSchema") + 400]
    assert "l_orderkey" not in read_schema, "column pruning failed"
    assert "l_partkey" not in read_schema, "column pruning failed"
    assert "l_quantity" in read_schema


def test_approx_distinct_close_to_exact(spark):
    """The query now emits (exact_parts, approx_within_5pct) so the oracle
    can hash-compare it; cross-check exact against agg_core and require the
    within-tolerance flag to be set for every group."""
    qs = registry.queries()
    rows = {
        r["l_returnflag"]: r
        for r in qs["agg_approx_distinct"](spark, SF_SMOKE).collect()
    }
    exact = {
        r["l_returnflag"]: r["n_parts"]
        for r in qs["agg_core"](spark, SF_SMOKE).collect()
    }
    assert set(rows) == set(exact)
    for k, v in exact.items():
        assert rows[k]["exact_parts"] == v
        assert rows[k]["approx_within_5pct"] == 1


def test_topk_per_group_k(spark):
    rows = registry.queries()["topk_per_group"](spark, SF_SMOKE).collect()
    from collections import Counter

    per_seg = Counter(r["c_mktsegment"] for r in rows)
    assert all(v <= 3 for v in per_seg.values())
    assert all(r["rn"] <= 3 for r in rows)


def test_exact_scaled_sums_partition_invariant_and_equals_decimal(spark):
    """The scaled-long two-level aggregation must produce the SAME double
    as decimal(38,6) accumulation, independent of how rows are
    partitioned (integer addition is exact and associative — the whole
    point of the pattern)."""
    from pyspark.sql import functions as F
    from basic_data_pipeline_spark.queries.relational import _exact_grouped_sums

    rows = [(i % 3, (i * 7919 % 100000) / 100.0) for i in range(5000)]
    base = spark.createDataFrame(rows, "k int, x double")

    def fast(df):
        out = _exact_grouped_sums(df, ["k"], {"s": F.col("x")})
        return {r["k"]: (r["s"], r["n"]) for r in out.collect()}

    ref = {
        r["k"]: (r["s"], r["n"])
        for r in base.groupBy("k")
        .agg(
            F.sum(F.col("x").cast("decimal(38,6)")).cast("double").alias("s"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert fast(base.repartition(1)) == ref
    assert fast(base.repartition(32)) == ref
    assert fast(base.repartition(7, "k")) == ref


def test_exact_scaled_sums_negative_values(spark):
    """Sign-aware rounding: negative inputs (refund/credit columns) must
    match the decimal oracle too — the double→long cast truncates toward
    zero, so the half-step points AWAY from zero. 2-decimal money values
    like -4.99 are the live case: x·10⁶ lands just past the integer on
    the wrong side, so the old +0.5 form was off by 1e-6 on every
    negative row."""
    from pyspark.sql import functions as F
    from basic_data_pipeline_spark.queries.relational import _exact_grouped_sums

    rows = [
        (i % 3, ((i * 7919 % 100000) / 100.0) * (-1 if i % 2 else 1))
        for i in range(5000)
    ]
    rows += [(2, -4.99), (2, 0.0), (0, -0.01)]
    base = spark.createDataFrame(rows, "k int, x double")

    got = {
        r["k"]: (r["s"], r["n"])
        for r in _exact_grouped_sums(base.repartition(13), ["k"], {"s": F.col("x")}).collect()
    }
    ref = {
        r["k"]: (r["s"], r["n"])
        for r in base.groupBy("k")
        .agg(
            F.sum(F.col("x").cast("decimal(38,6)")).cast("double").alias("s"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert got == ref
