"""WARC (ISO 28500) web-archive reading — the Common Crawl front end.

Crawl corpora arrive as WARC files: a sequence of records, each a block
of ``Name: value`` headers, a blank line, and a Content-Length-sized
body; ``response`` records wrap a full HTTP response (status line +
headers + HTML). Common Crawl gzips each record as its OWN gzip member,
so a file is also one valid multi-member gzip stream — stdlib
``zlib``/``gzip`` decompresses it without any archive library.

Spark shape: ``spark.read.format("binaryFile")`` hands each WARC file
to one task (wildcards fan out across files — a crawl segment is
thousands of them, so file-level parallelism IS the partitioning; no
custom InputFormat needed), and ``read_warc`` explodes files into one
row per response record via mapInPandas. At 100 TB the unit of work is
the ~1 GB WARC file — the same granularity every production crawl
pipeline uses — and the decode stage is CPU-bound Python, sized like
the image/audio decode stages (embarrassingly parallel, zero shuffle).

The parser is deliberately strict about structure (Content-Length walks
the records; a malformed length aborts that FILE's remaining records,
never crashes the job) and deliberately lenient about content (HTTP
bodies decode with charset from the Content-Type header, falling back
to utf-8-replace — a crawl always contains garbage bytes).

The reference ships no archive handling (its ingest is Kafka envelopes,
consumer_to_file.py); this is the north-star crawl-ingest surface.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("body", T.StringType()),
    ]
)


def _split_headers(block: bytes) -> dict:
    headers: dict = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
    return headers


def _decode_body(body: bytes, content_type: str) -> str:
    charset = "utf-8"
    if "charset=" in content_type:
        charset = content_type.split("charset=", 1)[1].split(";")[0].strip()
    try:
        return body.decode(charset, errors="replace")
    except LookupError:
        return body.decode("utf-8", errors="replace")


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Yield one dict per WARC *response* record in a (possibly
    multi-member-gzipped) WARC byte stream. Structural damage stops the
    walk at the damaged record; prior records still yield."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
        except OSError:
            return
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if not data[pos : pos + 5] == b"WARC/":
            return
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            return
        headers = _split_headers(data[pos:hdr_end])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            return
        body_start = hdr_end + 4
        body = data[body_start : body_start + length]
        if len(body) < length:
            return
        pos = body_start + length
        if headers.get("warc-type") != "response":
            continue
        # the payload is a full HTTP response: status line, headers,
        # blank line, entity body
        http_end = body.find(b"\r\n\r\n")
        if http_end < 0:
            continue
        status_line = body.split(b"\r\n", 1)[0]
        try:
            status = int(status_line.split()[1])
        except (IndexError, ValueError):
            continue
        http_headers = _split_headers(body[:http_end])
        ctype = http_headers.get("content-type", "")
        yield {
            "record_id": headers.get("warc-record-id", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "http_status": status,
            "content_type": ctype,
            "body": _decode_body(body[http_end + 4 :], ctype),
        }


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """(warc_file, record_id, target_uri, warc_date, http_status,
    content_type, body) — one row per HTTP response record under
    ``path`` (a file, directory, or glob of .warc / .warc.gz files).
    One task per file; record explosion happens inside mapInPandas."""
    files = spark.read.format("binaryFile").load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_records(bytes(content)):
                    rec["warc_file"] = fpath
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    return files.select("path", "content").mapInPandas(run, WARC_SCHEMA)
