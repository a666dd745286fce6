"""Data-quality operators: single-pass profile, expectation checks,
snapshot diff, PSI drift (operators/quality.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import quality as Q


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- profile_columns ------------------------------------------------------

def test_profile_matches_direct_aggregates(spark, docs):
    prof = {
        r["column"]: r
        for r in Q.profile_columns(
            docs, ["doc_id", "lang", "n_chars"], exact_distinct=True
        ).collect()
    }
    n = docs.count()
    for c in ("doc_id", "lang", "n_chars"):
        assert prof[c]["n_rows"] == n
        assert prof[c]["n_null"] == docs.filter(F.col(c).isNull()).count()
        assert prof[c]["n_distinct"] == docs.select(c).distinct().count()
    lo, hi = docs.agg(F.min("n_chars"), F.max("n_chars")).first()
    assert prof["n_chars"]["min_value"] == str(lo)
    assert prof["n_chars"]["max_value"] == str(hi)
    avg = docs.agg(F.avg("n_chars")).first()[0]
    assert math.isclose(prof["n_chars"]["avg_value"], avg, rel_tol=1e-12)
    # non-numeric column has no mean
    assert prof["lang"]["avg_value"] is None


def test_profile_nulls_counted(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], "id int, v string"
    )
    r = {x["column"]: x for x in Q.profile_columns(df, exact_distinct=True).collect()}
    assert r["v"]["n_null"] == 2 and r["v"]["n_distinct"] == 1
    assert r["id"]["n_null"] == 0 and r["id"]["n_distinct"] == 3


def test_profile_exotic_column_names(spark):
    """Column names with spaces/quotes profile cleanly — no SQL-string
    embedding of user identifiers (pure Column API)."""
    df = spark.createDataFrame([(1, "x"), (2, None)], ["a b", "it's"])
    r = {
        x["column"]: x
        for x in Q.profile_columns(df, exact_distinct=True).collect()
    }
    assert r["a b"]["n_distinct"] == 2 and r["it's"]["n_null"] == 1
    checks = Q.check_constraints(
        df, [Q.Check("odd 'name'", cond=df["a b"] > 0)]
    ).collect()
    assert checks[0]["check"] == "odd 'name'" and checks[0]["passed"]


def test_profile_single_job_plan(docs):
    """The whole profile is ONE aggregation — exactly one Aggregate chain,
    no join/union of per-column subplans."""
    plan = Q.profile_columns(docs, ["doc_id", "n_chars"])._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan and "Union" not in plan


# --- check_constraints ----------------------------------------------------

def test_checks_pass_and_fail(docs):
    n = docs.count()
    res = {
        r["check"]: r
        for r in Q.check_constraints(
            docs,
            [
                Q.not_null("text_not_null", "text"),
                Q.unique("pk_unique", "doc_id"),
                Q.in_range("chars_range", "n_chars", 0, 10**9),
                Q.accepted_values("langs", "lang", ["xx"]),
                Q.condition(
                    "half_longer_100",
                    F.col("n_chars") > 100,
                    min_fraction=0.5,
                ),
            ],
        ).collect()
    }
    assert res["text_not_null"]["passed"]
    assert res["pk_unique"]["passed"] and res["pk_unique"]["n_pass"] == n
    assert res["chars_range"]["passed"]
    # fixture langs are not all 'xx'
    assert not res["langs"]["passed"]
    frac = docs.filter(F.col("n_chars") > 100).count() / n
    assert math.isclose(res["half_longer_100"]["pass_fraction"], frac)
    assert res["half_longer_100"]["passed"] == (frac >= 0.5)


def test_checks_null_fails_condition(spark):
    df = spark.createDataFrame([(1,), (None,)], "v int")
    r = Q.check_constraints(
        df, [Q.condition("pos", F.col("v") > 0, min_fraction=0.4)]
    ).first()
    assert r["n_pass"] == 1 and r["passed"]  # NULL row fails, 0.5 >= 0.4


def test_checks_unique_detects_dup(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, v string")
    res = {r["check"]: r for r in Q.check_constraints(
        df, [Q.unique("k", "k"), Q.unique("kv", "k", "v")]
    ).collect()}
    assert not res["k"]["passed"] and res["k"]["n_pass"] == 2
    assert res["kv"]["passed"]


def test_checks_validation_errors(docs):
    with pytest.raises(ValueError):
        Q.check_constraints(docs, [])
    with pytest.raises(ValueError):
        Q.check_constraints(
            docs, [Q.not_null("x", "text"), Q.not_null("x", "lang")]
        )
    with pytest.raises(ValueError):
        Q.check_constraints(docs, [Q.Check("u", kind="unique")])


def test_checks_single_aggregation_plan(docs):
    plan = Q.check_constraints(
        docs, [Q.not_null("a", "text"), Q.in_range("b", "n_chars", 0, 10)]
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan and "Union" not in plan


# --- table_diff -----------------------------------------------------------

def test_table_diff_added_removed_changed(spark, docs):
    old = docs.filter(F.col("doc_id") < 400)
    new = (
        docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 410))
        .withColumn(
            "text",
            F.when(F.col("doc_id") % 100 == 11, F.lit("EDITED")).otherwise(
                F.col("text")
            ),
        )
    )
    d = Q.table_diff(old, new, ["doc_id"])
    got = {(r["op"], r["doc_id"]) for r in d.collect()}
    want = (
        {("removed", i) for i in range(0, 10)}
        | {("added", i) for i in range(400, 410)}
        | {("changed", i) for i in (11, 111, 211, 311)}
    )
    assert got == want


def test_table_diff_null_values_stable(spark):
    old = spark.createDataFrame([(1, None), (2, "x")], "k int, v string")
    new = spark.createDataFrame([(1, None), (2, None)], "k int, v string")
    got = {(r["op"], r["k"]) for r in Q.table_diff(old, new, ["k"]).collect()}
    assert got == {("changed", 2)}  # NULL==NULL is not a change


def test_table_diff_schema_mismatch_raises(spark, docs):
    with pytest.raises(ValueError):
        Q.table_diff(docs, docs.drop("lang"), ["doc_id"])


# --- psi_drift ------------------------------------------------------------

def test_psi_identical_snapshots_zero(docs):
    psi = (
        Q.psi_drift(docs, docs, "n_chars", 0, 2000, bins=8)
        .agg(F.sum("psi_term"))
        .first()[0]
    )
    assert abs(psi) < 1e-12


def test_psi_detects_shift(spark, docs):
    shifted = docs.withColumn("n_chars", F.col("n_chars") + F.lit(700))
    psi = (
        Q.psi_drift(docs, shifted, "n_chars", 0, 2000, bins=8)
        .agg(F.sum("psi_term"))
        .first()[0]
    )
    assert psi > 0.25  # "significant drift" territory


def test_psi_matches_serial_reference(spark):
    import collections
    a_vals = [1.0, 2.0, 5.0, 7.5, 9.9, 3.3, 3.3, 0.1]
    b_vals = [8.0, 8.5, 9.0, 1.0, 9.5, 9.9, 7.0, 6.5]
    bins, lo, hi, eps = 4, 0.0, 10.0, 1e-6
    a = spark.createDataFrame([(v,) for v in a_vals], "x double")
    b = spark.createDataFrame([(v,) for v in b_vals], "x double")
    got = {
        r["bin"]: r for r in Q.psi_drift(a, b, "x", lo, hi, bins).collect()
    }

    def fracs(vals):
        c = collections.Counter(
            min(max(int((v - lo) // (10.0 / bins)), 0), bins - 1) for v in vals
        )
        return {i: c.get(i, 0) / len(vals) for i in range(bins)}

    fa, fb = fracs(a_vals), fracs(b_vals)
    for i in range(bins):
        if fa[i] == 0 and fb[i] == 0:
            assert i not in got
            continue
        assert math.isclose(got[i]["frac_a"], fa[i], abs_tol=1e-12)
        assert math.isclose(got[i]["frac_b"], fb[i], abs_tol=1e-12)
        pa, pb = max(fa[i], eps), max(fb[i], eps)
        assert math.isclose(
            got[i]["psi_term"], (pb - pa) * math.log(pb / pa), rel_tol=1e-9
        )


def test_psi_param_validation(docs):
    with pytest.raises(ValueError):
        Q.psi_drift(docs, docs, "n_chars", 10, 10, bins=4)
    with pytest.raises(ValueError):
        Q.psi_drift(docs, docs, "n_chars", 0, 10, bins=0)
