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
