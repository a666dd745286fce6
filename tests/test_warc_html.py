"""WARC reading (sources/warc.py) + HTML main-content extraction
(operators/htmlx.py) — the crawl front end, end to end."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import htmlx
from basic_data_pipeline_spark.sources import warc

ARTICLE = (
    "This is the main article text of the page and it talks at length "
    "about the subject of the test in a way that is clearly content."
)
ARTICLE2 = (
    "A second long paragraph continues the discussion of the topic and "
    "adds enough words that the classifier sees real prose in it."
)
NAV = '<a href="/">Home</a> <a href="/about">About</a> <a href="/x">X</a>'

PAGE = f"""<html><head><title> The   Test Page </title>
<style>body {{ color: red }}</style>
<script>var x = "the of and to in a that is";</script></head>
<body><nav>{NAV}</nav>
<h2>Short headline</h2>
<p>{ARTICLE}</p>
<div>{ARTICLE2}</div>
<footer><a href="/tos">Terms</a> tiny</footer>
</body></html>"""


def _http_response(body: bytes, ctype=b"text/html; charset=utf-8") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype
        + b"\r\nContent-Length: " + str(len(body)).encode()
        + b"\r\n\r\n" + body
    )


def _warc_record(uri: bytes, payload: bytes, wtype=b"response") -> bytes:
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + wtype + b"\r\n"
        b"WARC-Record-ID: <urn:uuid:" + uri + b">\r\n"
        b"WARC-Date: 2024-06-01T00:00:00Z\r\n"
        b"WARC-Target-URI: http://example.org/" + uri + b"\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        b"\r\n" + payload + b"\r\n\r\n"
    )


def _warc_bytes(gz: bool) -> bytes:
    recs = [
        _warc_record(b"info", b"software: test", wtype=b"warcinfo"),
        _warc_record(b"p1", _http_response(PAGE.encode())),
        _warc_record(b"p2", _http_response(b"<html><body><p>" + ARTICLE.encode() + b"</p></body></html>")),
        _warc_record(b"p404", b"HTTP/1.1 404 Not Found\r\n\r\ngone"),
    ]
    if gz:
        # Common Crawl style: each record its own gzip member
        return b"".join(gzip.compress(r) for r in recs)
    return b"".join(recs)


@pytest.mark.parametrize("gz", [False, True])
def test_parse_warc_records(gz):
    recs = list(warc.parse_warc_records(_warc_bytes(gz)))
    # warcinfo skipped; response records (incl. the 404) parsed
    assert [r["target_uri"] for r in recs] == [
        "http://example.org/p1",
        "http://example.org/p2",
        "http://example.org/p404",
    ]
    assert recs[0]["http_status"] == 200
    assert recs[2]["http_status"] == 404
    assert "main article text" in recs[0]["body"]
    assert recs[0]["content_type"].startswith("text/html")


def test_parse_stops_at_damage_keeps_prior():
    good = _warc_record(b"ok", _http_response(b"<p>x</p>"))
    damaged = good + b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: oops\r\n\r\n"
    recs = list(warc.parse_warc_records(damaged))
    assert len(recs) == 1 and recs[0]["target_uri"].endswith("/ok")


def test_read_warc_through_spark(spark, tmp_path):
    (tmp_path / "a.warc.gz").write_bytes(_warc_bytes(True))
    (tmp_path / "b.warc").write_bytes(_warc_bytes(False))
    df = warc.read_warc(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 6  # 3 responses per file
    assert {r["warc_file"].split("/")[-1] for r in rows} == {
        "a.warc.gz", "b.warc"
    }
    ok = df.filter(F.col("http_status") == 200)
    assert ok.count() == 4


# --- extraction -----------------------------------------------------------


def test_extract_main_text_keeps_article_drops_boilerplate():
    title, text, nb, ng = htmlx.extract_main_text(PAGE)
    assert title == "The Test Page"
    assert ARTICLE in text and ARTICLE2 in text
    assert "Home" not in text and "Terms" not in text
    assert "color: red" not in text and "var x" not in text
    assert 0 < ng < nb


def test_headline_promotion():
    _, text, _, _ = htmlx.extract_main_text(PAGE)
    assert "Short headline" in text  # short block before good content


def test_link_density_kills_link_farms():
    farm = "<p>" + " ".join(
        f'<a href="/{i}">the link number {i} of the farm</a>' for i in range(30)
    ) + "</p>"
    _, text, _, ng = htmlx.extract_main_text(f"<html><body>{farm}</body></html>")
    assert ng == 0 and text == ""


def test_malformed_html_never_raises():
    _, text, _, _ = htmlx.extract_main_text("<p><b>" + ARTICLE + "<div</p>&&&")
    assert ARTICLE.split()[0] in text or text == ""


def test_warc_to_corpus_pipeline(spark, tmp_path):
    """End to end: WARC file -> read_warc -> html_extract -> a text
    corpus frame ready for prepare_training_corpus."""
    (tmp_path / "crawl.warc.gz").write_bytes(_warc_bytes(True))
    pages = warc.read_warc(spark, str(tmp_path)).filter(
        (F.col("http_status") == 200)
        & F.col("content_type").startswith("text/html")
    )
    docs = htmlx.html_extract(pages).filter(F.col("n_good") > 0)
    rows = docs.collect()
    assert {r["target_uri"] for r in rows} == {
        "http://example.org/p1",
        "http://example.org/p2",
    }
    for r in rows:
        assert ARTICLE.split()[4] in r["text"]
