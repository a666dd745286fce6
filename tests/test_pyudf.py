"""§2.10 Python-surface tests: every UDF variant pinned to a JVM-side
equivalent so the Arrow path can never drift semantically."""

from __future__ import annotations

from pyspark.sql import functions as F

from basic_data_pipeline_spark.functions.pyudf import (
    SentencesUDTF,
    cosine_pudf,
    python_type_of_json,
    sentences_jvm,
    weighted_mean_pudf,
    zscore_by_group,
)
from basic_data_pipeline_spark.operators.similarity import as_double_array, cosine

SF_DIR = "/root/testdata/sf0.001"


def test_scalar_pandas_udf_matches_jvm_cosine(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(200)
    a = e.select("vec_id", as_double_array(F.col("embedding")).alias("v"))
    pairs = (
        a.alias("x")
        .join(a.alias("y"), F.col("x.vec_id") == F.col("y.vec_id") - 1)
        .select(
            cosine(F.col("x.v"), F.col("y.v")).alias("jvm"),
            cosine_pudf(F.col("x.v"), F.col("y.v")).alias("py"),
        )
    )
    rows = pairs.collect()
    assert rows
    assert all(abs(r["jvm"] - r["py"]) < 1e-9 for r in rows)


def test_grouped_agg_pandas_udf_matches_builtin_decomposition(spark):
    from basic_data_pipeline_spark.catalog import load_table

    e = load_table(spark, SF_DIR, "events")
    df = e.select(
        "event_type",
        F.col("value").alias("v"),
        (F.col("user_id") + 1).cast("double").alias("w"),
    )
    got = {
        r["event_type"]: r["wm"]
        for r in df.groupBy("event_type")
        .agg(weighted_mean_pudf("v", "w").alias("wm"))
        .collect()
    }
    exp = {
        r["event_type"]: r["wm"]
        for r in df.groupBy("event_type")
        .agg((F.sum(F.col("v") * F.col("w")) / F.sum("w")).alias("wm"))
        .collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-9


def test_grouped_map_applyinpandas_matches_window_zscore(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "label", F.col("embedding")[0].cast("double").alias("x")
    )
    got = {
        r["vec_id"]: r["z_value"]
        for r in zscore_by_group(
            e.withColumnRenamed("x", "value"), "label", "value"
        ).collect()
    }
    from pyspark.sql.window import Window as W

    w = W.partitionBy("label")
    exp = {
        r["vec_id"]: r["z"]
        for r in e.select(
            "vec_id",
            (
                (F.col("x") - F.mean("x").over(w)) / F.stddev_pop("x").over(w)
            ).alias("z"),
        ).collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-9


def test_udtf_lateral_matches_jvm_explode(spark):
    """Python UDTF (LATERAL) == the split+posexplode codegen form, on
    real fixture documents — same rows, ordinals, and word counts."""
    spark.udtf.register("sentences", SentencesUDTF)
    d = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
    )
    d.createOrReplaceTempView("_udtf_docs")
    got = {
        (r["doc_id"], r["sent_id"]): (r["sentence"], r["n_words"])
        for r in spark.sql(
            "SELECT doc_id, s.sent_id, s.sentence, s.n_words "
            "FROM _udtf_docs, LATERAL sentences(text) AS s"
        ).collect()
    }
    want = {
        (r["doc_id"], r["sent_id"]): (r["sentence"], r["n_words"])
        for r in sentences_jvm(d, "text").collect()
    }
    assert got == want and len(got) >= 50


def test_udtf_handles_null_and_empty(spark):
    spark.udtf.register("sentences", SentencesUDTF)
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "...!?"), (4, "One. Two two.")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("_udtf_edge")
    rows = spark.sql(
        "SELECT doc_id, s.* FROM _udtf_edge, LATERAL sentences(text) AS s"
    ).collect()
    assert {(r["doc_id"], r["sent_id"], r["n_words"]) for r in rows} == {
        (4, 0, 1), (4, 1, 2)
    }


def test_row_udf_type_inference(spark):
    df = spark.createDataFrame(
        [("42",), ("4.5",), ("true",), ('"hi"',), ("[1,2]",), ('{"a":1}',),
         ("plain text",), (None,)],
        "v string",
    )
    got = [r["t"] for r in df.select(python_type_of_json("v").alias("t")).collect()]
    assert got == ["int", "float", "bool", "str", "list", "dict", "str", "none"]
