"""Count-min sketch guarantees on real fixture tokens: never an
underestimate, bounded overestimate, exact shard mergeability, and
determinism under repartitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import sketches

SF_DIR = "/root/testdata/sf0.001"
W_ = 1024
D_ = 4


def _tokens(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    )


def test_cms_never_underestimates_and_bounds_overestimate(spark):
    toks = _tokens(spark).cache()
    n_total = toks.count()
    true = {
        r["tok"]: r["n"]
        for r in toks.groupBy("tok").agg(F.count("*").alias("n")).collect()
    }
    sk = sketches.cms_build(toks, "tok", depth=D_, width=W_)
    est = {
        r["item"]: r["est"]
        for r in sketches.cms_estimate(
            sk, toks.select("tok").distinct(), "tok", width=W_
        ).collect()
    }
    assert set(est) == set(true)
    for t, n in true.items():
        assert est[t] >= n, t  # the one-sided CMS guarantee
    # expected overestimate per row is N/width per hash row; min over
    # depth rows is far tighter — allow 5x the single-row expectation
    slack = 5 * n_total / W_
    assert all(est[t] - true[t] <= slack for t in true), max(
        est[t] - true[t] for t in true
    )
    # heavy hitters survive the sketch: top-10 by estimate ⊇ top-5 true
    top_true = sorted(true, key=lambda t: (-true[t], t))[:5]
    top_est = sorted(est, key=lambda t: (-est[t], t))[:10]
    assert set(top_true) <= set(top_est)


def test_cms_shard_merge_equals_full_sketch(spark):
    toks = _tokens(spark).withColumn(
        "half", F.pmod(F.xxhash64("tok"), F.lit(2))
    )
    full = sketches.cms_build(toks, "tok", depth=D_, width=W_)
    merged = sketches.cms_merge(
        sketches.cms_build(toks.filter(F.col("half") == 0), "tok", D_, W_),
        sketches.cms_build(toks.filter(F.col("half") == 1), "tok", D_, W_),
    )
    as_set = lambda df: {
        (r["h"], r["bucket"], r["cnt"]) for r in df.collect()
    }
    assert as_set(merged) == as_set(full)


def test_cms_deterministic_under_repartitioning(spark):
    toks = _tokens(spark)
    a = sketches.cms_build(toks, "tok", depth=D_, width=W_)
    b = sketches.cms_build(toks.repartition(17), "tok", depth=D_, width=W_)
    as_set = lambda df: {
        (r["h"], r["bucket"], r["cnt"]) for r in df.collect()
    }
    assert as_set(a) == as_set(b)


# --- Misra-Gries heavy hitters --------------------------------------------

def test_mg_guarantees_on_skewed_data(spark):
    """Every item with true freq > n/(k+1) present; estimates one-sided
    (est <= true) with underestimate <= n/(k+1) — under TWO different
    partitionings (estimates may differ, the bounds may not)."""
    import collections

    from basic_data_pipeline_spark.operators import sketches

    rows = (
        [("hot",)] * 400 + [("warm",)] * 150 + [("mild",)] * 60
        + [(f"cold{i}",) for i in range(390)]
    )
    truth = collections.Counter(r[0] for r in rows)
    n, k = len(rows), 8
    base = spark.createDataFrame(rows, "w string")
    for parts in (1, 7):
        got = {
            r["item"]: r["est"]
            for r in sketches.heavy_hitters(
                base.repartition(parts), "w", k
            ).collect()
        }
        for item, c in truth.items():
            if c > n / (k + 1):
                assert item in got, (parts, item)
        for item, est in got.items():
            assert 0 < est <= truth[item]
            assert truth[item] - est <= n / (k + 1)


def test_mg_merge_equals_whole_within_bounds(spark):
    """Shard summaries merged == the n/(k+1) bound over the COMBINED
    stream (the mergeable-summaries theorem, exercised across shards)."""
    import collections

    from basic_data_pipeline_spark.operators import sketches

    a_rows = [("x",)] * 300 + [(f"a{i}",) for i in range(100)]
    b_rows = [("x",)] * 50 + [("y",)] * 200 + [(f"b{i}",) for i in range(50)]
    truth = collections.Counter(r[0] for r in a_rows + b_rows)
    n, k = len(a_rows) + len(b_rows), 4
    sa = sketches.mg_partition_summaries(
        spark.createDataFrame(a_rows, "w string").coalesce(1), "w", k
    )
    sb = sketches.mg_partition_summaries(
        spark.createDataFrame(b_rows, "w string").coalesce(1), "w", k
    )
    got = {
        r["item"]: r["est"]
        for r in sketches.mg_merge(sa.unionByName(sb), k).collect()
    }
    for item, c in truth.items():
        if c > n / (k + 1):
            assert item in got
    for item, est in got.items():
        assert 0 < est <= truth[item] and truth[item] - est <= n / (k + 1)


def test_mg_small_input_exact(spark):
    """Fewer distinct items than k: MG is exact (no decrements ever)."""
    from basic_data_pipeline_spark.operators import sketches

    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2
    got = {
        r["item"]: r["est"]
        for r in sketches.heavy_hitters(
            spark.createDataFrame(rows, "w string").coalesce(1), "w", 10
        ).collect()
    }
    assert got == {"a": 5, "b": 3, "c": 2}


def test_mg_validates(spark):
    import pytest

    from basic_data_pipeline_spark.operators import sketches

    df = spark.createDataFrame([("a",)], "w string")
    with pytest.raises(ValueError):
        sketches.mg_partition_summaries(df, "w", 0)


def test_mg_on_fixture_tokens(spark, sf_dir):
    """Real corpus tokens: the k heaviest whitespace tokens by true count
    all appear in a k-counter summary when they clear the bound."""
    import collections

    from pyspark.sql import functions as F

    from basic_data_pipeline_spark.operators import sketches

    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
    )
    truth = collections.Counter(r["w"] for r in toks.collect())
    n, k = sum(truth.values()), 30
    got = {
        r["item"]: r["est"]
        for r in sketches.heavy_hitters(toks, "w", k).collect()
    }
    for item, c in truth.items():
        if c > n / (k + 1):
            assert item in got
    for item, est in got.items():
        assert est <= truth[item] and truth[item] - est <= n / (k + 1)
