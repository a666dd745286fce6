"""Fuzzy edit-distance join vs the brute-force predicate
(operators/entity.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import entity


def brute_pairs(spark, df, k):
    a, b = df.alias("a"), df.alias("b")
    return {
        (r["id_a"], r["id_b"], r["dist"])
        for r in a.crossJoin(b)
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.levenshtein(
                F.lower(F.trim(F.col("a.name"))),
                F.lower(F.trim(F.col("b.name"))),
            ).alias("dist"),
        )
        .filter(F.col("dist") <= k)
        .collect()
    }


NAMES = [
    (1, "John Smith"),
    (2, "Jon Smith"),       # 1 edit from John Smith
    (3, "John Smyth"),      # 1 edit
    (4, "Jane Smith"),      # 2 edits from John Smith
    (5, "  john smith "),   # 0 after normalization
    (6, "Completely Different"),
    (7, "ab"),              # short-string regime
    (8, "ac"),              # 1 edit from ab, shares NO gram
    (9, "xy"),              # 2 edits from ab
    (10, "abc"),
    (11, "Jhn Smith"),      # 1 deletion from John Smith
]


@pytest.fixture(scope="module")
def names(spark):
    return spark.createDataFrame(NAMES, "id long, name string")


@pytest.mark.parametrize(
    "k", [1, pytest.param(2, marks=pytest.mark.slow)]
)
def test_fuzzy_pairs_exact_vs_bruteforce(spark, names, k):
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in entity.fuzzy_pairs(names, "id", "name", max_edit=k).collect()
    }
    assert got == brute_pairs(spark, names, k)
    assert len(got) > 3  # the fixture exercises real matches


def test_short_strings_not_missed(spark, names):
    """'ab' vs 'ac' share zero 3-grams — only the short-string sentinel
    block can find them; the prefix bound alone would miss the pair."""
    got = {
        (r["id_a"], r["id_b"])
        for r in entity.fuzzy_pairs(names, "id", "name", max_edit=1).collect()
    }
    assert (7, 8) in got
    assert (7, 9) not in got  # distance 2 > k


def test_fuzzy_pairs_on_fixture_customers(spark, sf_dir):
    """Real fixture names: the blocked pipeline equals brute force on a
    300-name slice (every pair differing in one digit must surface)."""
    c = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_custkey") < 300)
        .select(F.col("c_custkey").alias("id"), F.col("c_name").alias("name"))
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in entity.fuzzy_pairs(c, "id", "name", max_edit=1).collect()
    }
    want = {(a, b, d) for a, b, d in brute_pairs(spark, c, 1)}
    assert got == {(a, b) for a, b, _ in want} and len(got) > 100


def test_fuzzy_join_two_tables(spark):
    a = spark.createDataFrame(
        [(1, "acme corp"), (2, "globex"), (3, "zz")], "id long, name string"
    )
    b = spark.createDataFrame(
        [(10, "acme corp."), (20, "initech"), (30, "zy")],
        "id long, name string",
    )
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in entity.fuzzy_join(a, b, "id", "name", max_edit=1).collect()
    }
    assert got == {(1, 10, 1), (3, 30, 1)}


def test_partition_invariance(spark, names):
    a = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in entity.fuzzy_pairs(
            names.repartition(7), "id", "name", max_edit=2
        ).collect()
    }
    b = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in entity.fuzzy_pairs(
            names.coalesce(1), "id", "name", max_edit=2
        ).collect()
    }
    assert a == b


def test_resolve_entities_typo_chains(spark):
    """a~b~c typo chains collapse to one entity_id (the component min),
    singletons keep their own id."""
    df = spark.createDataFrame(
        [
            (1, "acme corp"),
            (2, "acme corpx"),   # 1 edit from 1
            (3, "acme corpxy"),  # 1 edit from 2, 2 edits from 1
            (9, "globex"),
        ],
        "id long, name string",
    )
    got = {
        r["id"]: r["entity_id"]
        for r in entity.resolve_entities(df, "id", "name", max_edit=1).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 9: 9}


def test_no_cartesian_in_plan(names):
    """The blocked pipeline must plan equi-joins — no CartesianProduct /
    BroadcastNestedLoop anywhere (the whole point vs the naive form)."""
    plan = entity.fuzzy_pairs(names, "id", "name")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_verify_side_pruned_to_participants(names):
    """r8: the verify stage's text frame must carry the participant
    semi-join prune (the dedup.jaccard_verify rule) — without it both
    verify joins shuffle the whole corpus's normalized text for a
    candidate-sized pair set."""
    for frame in (
        entity.fuzzy_pairs(names, "id", "name"),
        entity.fuzzy_join(names, names, "id", "name"),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan
