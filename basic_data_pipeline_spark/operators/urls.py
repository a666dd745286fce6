"""URL canonicalization — the first dedup key of every crawl pipeline.

Before any content-level dedup, crawl pipelines collapse URL variants
(case-shifted hosts, default ports, fragments, tracking parameters,
shuffled query strings, trailing slashes) onto one canonical form and
dedup on it — it is the cheapest 30-50% volume cut in the stack, and it
must be EXACTLY deterministic because the canonical string becomes a
join/partition key everywhere downstream.

Everything here is pure JVM column expressions (regexp + array
functions — no UDF, no Python): the canonicalization runs inside
whole-stage codegen at scan speed, and the identical transformation is
replayable in ANSI SQL, which is how the oracle pins it bit-for-bit
(`text_lang_token[url]`).

Canonical form (RFC 3986 normalization + the crawl conventions):

* fragment dropped;
* scheme and authority lowercased (path/query case is significant and
  kept);
* default port stripped (``:80`` for http, ``:443`` for https);
* tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``mc_eid``, ``igshid``, ``ref_src``);
* remaining query parameters SORTED (byte order) — parameter order is
  almost never semantic, and unsorted order is the #1 cause of
  spurious URL variants;
* empty path → ``/``; trailing slash stripped off non-root paths;
* optional ``www.`` stripping (off by default: some hosts really do
  differ).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|igshid|ref_src)="


def canonical_url(url: Column, strip_www: bool = False) -> Column:
    """The canonical form of ``url`` (see module docstring), or the
    trimmed input unchanged when it does not parse as
    ``scheme://authority...`` (relative links and garbage pass through
    — the caller filters on :func:`is_absolute_url` when it cares)."""
    u = F.trim(url)
    nofrag = F.regexp_replace(u, r"#.*$", "")
    query = F.regexp_extract(nofrag, r"\?(.*)$", 1)
    base = F.regexp_replace(nofrag, r"\?.*$", "")
    scheme = F.lower(F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.lower(F.regexp_extract(base, r"^[^:/?]+://([^/]*)", 1))
    path = F.regexp_extract(base, r"^[^:/?]+://[^/]*(/.*)?$", 1)
    # default ports
    auth = F.when(
        (scheme == "http") & auth.endswith(":80"),
        F.substring(auth, F.lit(1), F.length(auth) - 3),
    ).otherwise(auth)
    auth = F.when(
        (scheme == "https") & auth.endswith(":443"),
        F.substring(auth, F.lit(1), F.length(auth) - 4),
    ).otherwise(auth)
    if strip_www:
        auth = F.regexp_replace(auth, r"^www\.", "")
    # path: empty -> '/', strip one trailing slash off non-root
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (path != "/") & path.endswith("/"),
        F.substring(path, F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    # query: drop tracking params, sort the rest
    parts = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    q2 = F.array_join(F.array_sort(parts), "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", rebuilt).otherwise(u)


def is_absolute_url(url: Column) -> Column:
    return F.trim(url).rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://")


def url_host(url: Column) -> Column:
    """Lowercased host without port/credentials — the per-site
    aggregation key (feeds operators/domains.py quotas directly)."""
    auth = F.lower(F.regexp_extract(F.trim(url), r"^[^:/?]+://([^/?]*)", 1))
    auth = F.regexp_replace(auth, r"^[^@]*@", "")
    return F.regexp_replace(auth, r":\d+$", "")


def url_dedup(
    pages: DataFrame, url_col: str, strip_www: bool = False
) -> DataFrame:
    """One row per canonical URL (first row by the frame's ordering of
    a deterministic min — the lowest tie-break on every remaining
    column is overkill; crawl practice keeps ANY one fetch, so this
    keeps the row whose natural ordering key is smallest: the min
    struct). Adds the ``canonical_url`` column."""
    keyed = pages.withColumn(
        "canonical_url", canonical_url(F.col(url_col), strip_www)
    )
    others = [c for c in keyed.columns if c != "canonical_url"]
    return (
        keyed.groupBy("canonical_url")
        .agg(F.min(F.struct(*others)).alias("_r"))
        .select("canonical_url", *[F.col(f"_r.{c}").alias(c) for c in others])
    )


def robots_filter(
    pages: DataFrame,
    url_col: str,
    robots: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Drop pages their host's robots.txt disallows for ``agent`` —
    the compliance gate every responsible crawl pipeline applies before
    content ever enters a corpus. ``robots`` is a (host, robots_txt)
    frame (one fetch of /robots.txt per host — hosts number in the
    millions where pages number in the billions, so it broadcasts or
    hash-joins cheaply); hosts with no row are ALLOWED (the web
    convention: absent robots.txt means no restrictions).

    Parsing is stdlib ``urllib.robotparser`` inside one Arrow-batched
    mapInPandas stage, with parsers cached per distinct robots text
    within each batch — the host join has already clustered pages so a
    batch sees few distinct texts. Returns the pages frame with its
    original columns."""
    out_schema = pages.schema
    cols = [f.name for f in out_schema.fields]
    joined = pages.withColumn("_rf_h", url_host(F.col(url_col))).join(
        robots.select(
            F.col(host_col).alias("_rf_h"),
            F.col(robots_col).alias("_rf_txt"),
        ),
        "_rf_h",
        "left",
    )

    def run(batches):
        from urllib.robotparser import RobotFileParser

        cache: dict = {}

        def allowed(txt, url):
            if not isinstance(txt, str):  # no robots row: None (or NaN)
                return True
            rp = cache.get(txt)
            if rp is None:
                rp = RobotFileParser()
                rp.parse(txt.splitlines())
                cache[txt] = rp
            return rp.can_fetch(agent, url)

        for pdf in batches:
            mask = [
                allowed(t, u)
                for t, u in zip(pdf["_rf_txt"], pdf[url_col])
            ]
            yield pdf.loc[mask, cols]

    return joined.mapInPandas(run, out_schema)
