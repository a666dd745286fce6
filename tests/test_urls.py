"""URL canonicalization (operators/urls.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import urls as U

CASES = [
    # (input, canonical)
    ("HTTP://Example.COM:80/Path/?b=2&a=1#frag", "http://example.com/Path?a=1&b=2"),
    ("https://Example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/a/b/", "http://example.com/a/b"),
    (
        "https://ex.com/p?utm_source=tw&id=7&utm_campaign=x&fbclid=123",
        "https://ex.com/p?id=7",
    ),
    ("https://ex.com/p?utm_source=tw", "https://ex.com/p"),
    ("  https://ex.com/CaseInPath  ", "https://ex.com/CaseInPath"),
    ("not a url at all", "not a url at all"),
    ("/relative/path", "/relative/path"),
]


def _canon(spark, values, **kw):
    df = spark.createDataFrame([(v,) for v in values], "u string")
    return [
        r[0] for r in df.select(U.canonical_url(F.col("u"), **kw)).collect()
    ]


def test_canonical_url_cases(spark):
    got = _canon(spark, [c[0] for c in CASES])
    assert got == [c[1] for c in CASES]


def test_canonical_url_idempotent(spark):
    once = _canon(spark, [c[0] for c in CASES])
    twice = _canon(spark, once)
    assert twice == once


def test_strip_www(spark):
    assert _canon(spark, ["https://WWW.Ex.com/a"], strip_www=True) == [
        "https://ex.com/a"
    ]
    assert _canon(spark, ["https://WWW.Ex.com/a"]) == ["https://www.ex.com/a"]


def test_url_host_and_is_absolute(spark):
    df = spark.createDataFrame(
        [
            ("https://User:Pw@WWW.Ex.com:8443/a?q=1",),
            ("ftp://Files.ex.org/x",),
            ("nope",),
        ],
        "u string",
    )
    rows = df.select(
        U.url_host(F.col("u")).alias("h"),
        U.is_absolute_url(F.col("u")).alias("abs"),
    ).collect()
    assert rows[0]["h"] == "www.ex.com" and rows[0]["abs"]
    assert rows[1]["h"] == "files.ex.org" and rows[1]["abs"]
    assert rows[2]["h"] == "" and not rows[2]["abs"]


def test_url_dedup_collapses_variants(spark):
    rows = [
        (1, "http://EX.com:80/a?b=2&a=1"),
        (2, "http://ex.com/a?a=1&b=2&utm_source=x"),
        (3, "http://ex.com/other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = U.url_dedup(df, "url")
    got = {r["canonical_url"]: r["doc_id"] for r in out.collect()}
    assert got == {
        "http://ex.com/a?a=1&b=2": 1,  # min-struct keeps the lowest id
        "http://ex.com/other": 3,
    }


def test_url_dedup_partition_invariant(spark):
    rows = [(i, f"http://ex.com/p{i % 5}?x={i % 3}&utm_source=s") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    a = sorted(map(tuple, U.url_dedup(df, "url").collect()))
    b = sorted(map(tuple, U.url_dedup(df.repartition(7), "url").collect()))
    assert a == b and len(a) == 15
