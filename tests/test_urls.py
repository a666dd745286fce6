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


def test_robots_filter(spark):
    robots_a = "\n".join(
        [
            "User-agent: *",
            "Disallow: /private/",
            "",
            "User-agent: trainbot",
            "Disallow: /",
        ]
    )
    robots = spark.createDataFrame(
        [("a.com", robots_a), ("b.com", "User-agent: *\nAllow: /")],
        "host string, robots_txt string",
    )
    pages = spark.createDataFrame(
        [
            (1, "http://a.com/public/x"),
            (2, "http://a.com/private/secret"),
            (3, "http://b.com/anything"),
            (4, "http://c.com/no-robots-here"),
        ],
        "doc_id long, url string",
    )
    kept = {
        r["doc_id"]
        for r in U.robots_filter(pages, "url", robots).collect()
    }
    assert kept == {1, 3, 4}
    # agent-specific: trainbot is banned from a.com entirely
    kept_tb = {
        r["doc_id"]
        for r in U.robots_filter(pages, "url", robots, agent="trainbot").collect()
    }
    assert kept_tb == {3, 4}


def test_robots_filter_partition_invariant(spark):
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /x")],
        "host string, robots_txt string",
    )
    pages = spark.createDataFrame(
        [(i, f"http://a.com/{'x' if i % 3 == 0 else 'y'}/{i}") for i in range(60)],
        "doc_id long, url string",
    )
    a = {r["doc_id"] for r in U.robots_filter(pages, "url", robots).collect()}
    b = {
        r["doc_id"]
        for r in U.robots_filter(pages.repartition(7), "url", robots).collect()
    }
    assert a == b == {i for i in range(60) if i % 3 != 0}
