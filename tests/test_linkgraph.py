"""Link graph: href extraction, integer fixed-point PageRank, anchor
aggregation (operators/linkgraph.py). PageRank is checked bit-exactly
against the serial replay of the same integer recurrence
(pagerank_reference) — no float tolerance anywhere."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import linkgraph as LG

HTML = """
<html><body>
  <p>intro <a href="/docs/a.html">Docs &amp; guides</a> text</p>
  <a href="https://other.example.com/x?b=2&a=1">  cross   site  </a>
  <a href="../up.html"><b>nested <i>bold</i></b> anchor</a>
  <a href="mailto:x@example.com">mail</a>
  <a href="javascript:void(0)">js</a>
  <a href="#frag">fragment only</a>
  <a name="no-href">not a link</a>
  <a href="//cdn.example.com/lib.js">protocol relative</a>
  <a href="trailing.html">unclosed
</body></html>
"""


def test_links_from_html_resolution_and_filters():
    rows = LG.links_from_html("https://example.com/docs/page.html", HTML)
    dsts = [d for _, d, _ in rows]
    anchors = {d: a for _, d, a in rows}
    assert "https://example.com/docs/a.html" in dsts
    assert "https://other.example.com/x?b=2&a=1" in dsts
    assert "https://example.com/up.html" in dsts  # ../ resolved
    assert "https://cdn.example.com/lib.js" in dsts  # // inherits scheme
    # mailto/js/fragment-only dropped
    assert not [d for d in dsts if d.startswith(("mailto", "javascript"))]
    assert "https://example.com/docs/page.html#frag" not in dsts
    # entity decoded + whitespace normalized + nested tags flattened
    assert anchors["https://example.com/docs/a.html"] == "Docs & guides"
    assert anchors["https://other.example.com/x?b=2&a=1"] == "cross site"
    assert anchors["https://example.com/up.html"] == "nested bold anchor"
    # unclosed trailing <a> still flushed
    assert anchors["https://example.com/docs/trailing.html"] == "unclosed"
    # every src is the page
    assert {s for s, _, _ in rows} == {"https://example.com/docs/page.html"}


def test_links_from_html_malformed_inputs():
    assert LG.links_from_html("https://e.com/", "") == []
    assert LG.links_from_html("https://e.com/", None) == []
    # nested <a> auto-closes the outer one instead of erroring
    rows = LG.links_from_html(
        "https://e.com/", '<a href="/x">outer <a href="/y">inner</a>'
    )
    assert [(d, a) for _, d, a in rows] == [
        ("https://e.com/x", "outer"),
        ("https://e.com/y", "inner"),
    ]


def test_extract_links_matches_serial(spark):
    pages = spark.createDataFrame(
        [
            (1, "https://example.com/docs/page.html", HTML),
            (2, "https://b.org/", '<a href="p/q.html">q</a>'),
            (3, "https://c.net/", "<p>no links</p>"),
        ],
        "page_id long, target_uri string, body string",
    )
    got = sorted(
        LG.extract_links(pages, passthrough=("page_id",)).collect()
    )
    want = sorted(
        (pid,) + edge
        for pid, url, html in [
            (1, "https://example.com/docs/page.html", HTML),
            (2, "https://b.org/", '<a href="p/q.html">q</a>'),
            (3, "https://c.net/", "<p>no links</p>"),
        ]
        for edge in LG.links_from_html(url, html)
    )
    assert [tuple(r) for r in got] == want


def _spark_pagerank_dict(spark, edges, nodes=None, **kw):
    edf = spark.createDataFrame(edges, "src string, dst string")
    ndf = (
        spark.createDataFrame([(v,) for v in nodes], "node string")
        if nodes is not None
        else None
    )
    out = LG.pagerank(edf, nodes=ndf, **kw)
    return {r["node"]: (r["rank"], r["out_deg"]) for r in out.collect()}


TRIANGLE = [("a", "b"), ("b", "c"), ("c", "a")]
WEB = [
    ("hub", "p1"), ("hub", "p2"), ("hub", "p3"),
    ("p1", "hub"), ("p2", "hub"),
    ("p3", "dead"),            # dead: dangling (no out-edges)
    ("p1", "p2"), ("p2", "p2"),  # self-loop kept as given
    ("p1", "p2"),              # parallel edge doubles the link weight
]


@pytest.mark.parametrize(
    "edges,nodes,iters",
    [
        (TRIANGLE, None, 5),
        (WEB, None, 5),
        (WEB, ["hub", "p1", "p2", "p3", "dead", "island"], 4),
        (TRIANGLE, None, 0),
    ],
)
def test_pagerank_matches_serial_reference(spark, edges, nodes, iters):
    got = _spark_pagerank_dict(spark, edges, nodes, iterations=iters)
    want = LG.pagerank_reference(edges, nodes, iterations=iters)
    assert got == want


def test_pagerank_semantics(spark):
    ranks = LG.pagerank_reference(WEB, iterations=8)
    # p2 (extra in-links incl. a self-loop) out-ranks its twin p1
    assert ranks["p2"][0] > ranks["p1"][0]
    # the hub out-ranks its leaves; every rank positive; mass ≤ scale
    assert ranks["hub"][0] > ranks["p3"][0]
    assert all(r > 0 for r, _ in ranks.values())
    assert sum(r for r, _ in ranks.values()) <= LG.PAGERANK_SCALE
    # never-linked island still receives teleport + dangling share
    with_island = LG.pagerank_reference(
        WEB, ["hub", "p1", "p2", "p3", "dead", "island"], iterations=3
    )
    assert with_island["island"][0] > 0
    assert with_island["island"][1] == 0


def test_pagerank_personalized_matches_serial(spark):
    weights = {"hub": 3, "p1": 1}  # seed set; everything else weighs 0
    edf = spark.createDataFrame(WEB, "src string, dst string")
    wdf = spark.createDataFrame(
        list(weights.items()), "node string, weight long"
    )
    nodes = ["hub", "p1", "p2", "p3", "dead", "island"]
    ndf = spark.createDataFrame([(v,) for v in nodes], "node string")
    got = {
        r["node"]: (r["rank"], r["out_deg"])
        for r in LG.pagerank(
            edf, nodes=ndf, iterations=4, teleport_weights=wdf
        ).collect()
    }
    want = LG.pagerank_reference(WEB, nodes, iterations=4, weights=weights)
    assert got == want
    # zero-weight, never-linked island gets NO mass at all
    assert got["island"][0] == 0
    # the teleport advantage is real: p1 (seeded) out-ranks p3, its
    # structural twin (both receive exactly one hub link, nothing else)
    assert got["p1"][0] > got["p3"][0]


def test_pagerank_uniform_weights_equal_default(spark):
    edf = spark.createDataFrame(WEB, "src string, dst string")
    wdf = spark.createDataFrame(
        [(v, 1) for v in ["hub", "p1", "p2", "p3", "dead"]],
        "node string, weight long",
    )
    a = {r["node"]: r["rank"] for r in LG.pagerank(edf, iterations=3).collect()}
    b = {
        r["node"]: r["rank"]
        for r in LG.pagerank(
            edf, iterations=3, teleport_weights=wdf
        ).collect()
    }
    assert a == b


def test_pagerank_zero_weight_sum_raises(spark):
    edf = spark.createDataFrame(TRIANGLE, "src string, dst string")
    wdf = spark.createDataFrame([("zzz", 5)], "node string, weight long")
    with pytest.raises(ValueError, match="sum to 0"):
        LG.pagerank(edf, iterations=2, teleport_weights=wdf)


def test_pagerank_partitioning_invariance(spark):
    edf = spark.createDataFrame(WEB, "src string, dst string")
    a = {
        r["node"]: r["rank"]
        for r in LG.pagerank(edf.repartition(7), iterations=3).collect()
    }
    b = {
        r["node"]: r["rank"]
        for r in LG.pagerank(edf.coalesce(1), iterations=3).collect()
    }
    assert a == b


def test_pagerank_empty_graph(spark):
    edf = spark.createDataFrame([], "src string, dst string")
    assert LG.pagerank(edf, iterations=3).collect() == []


def test_pagerank_frees_its_checkpoints(spark):
    sc = spark.sparkContext
    before = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    edf = spark.createDataFrame(WEB, "src string, dst string")
    out = LG.pagerank(edf, iterations=3)
    out.collect()
    from basic_data_pipeline_spark.caching import free_local_checkpoint

    free_local_checkpoint(out)
    # everything the loop persisted (edges cache, per-iteration ranks,
    # node frame) is released once the result itself is freed;
    # unpersist is async, so poll briefly before judging
    import time

    for _ in range(50):
        after = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
        if after <= before:
            break
        time.sleep(0.1)
    assert after <= before


STAR = [
    ("h1", "a1"), ("h1", "a2"), ("h1", "a3"),
    ("h2", "a1"), ("h2", "a2"),
    ("h3", "a1"),
]


@pytest.mark.parametrize(
    "edges,nodes,iters",
    [
        (STAR, None, 5),
        (WEB, None, 4),
        (TRIANGLE, ["a", "b", "c", "lone"], 3),
        (STAR, None, 0),
    ],
)
def test_hits_matches_serial_reference(spark, edges, nodes, iters):
    edf = spark.createDataFrame(edges, "src string, dst string")
    ndf = (
        spark.createDataFrame([(v,) for v in nodes], "node string")
        if nodes is not None
        else None
    )
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in LG.hits(edf, nodes=ndf, iterations=iters).collect()
    }
    want = LG.hits_reference(edges, nodes, iterations=iters)
    assert got == want


def test_hits_semantics(spark):
    ranks = LG.hits_reference(STAR, iterations=8)
    hubs = {v: h for v, (h, _) in ranks.items()}
    auths = {v: a for v, (_, a) in ranks.items()}
    # a1 is cited by every hub → strongest authority; h1 cites the most
    # authorities → strongest hub; pure hubs have zero authority and
    # pure authorities zero hubness
    assert auths["a1"] > auths["a2"] > auths["a3"]
    assert hubs["h1"] > hubs["h2"] > hubs["h3"]
    assert all(auths[h] == 0 for h in ("h1", "h2", "h3"))
    assert all(hubs[a] == 0 for a in ("a1", "a2", "a3"))
    # renormalization keeps magnitudes bounded
    assert max(hubs.values()) <= 1 << LG.HITS_KEEP_BITS
    assert max(auths.values()) <= 1 << LG.HITS_KEEP_BITS


def test_hits_partitioning_invariance(spark):
    edf = spark.createDataFrame(WEB, "src string, dst string")
    a = {
        tuple(r)
        for r in LG.hits(edf.repartition(7), iterations=3).collect()
    }
    b = {tuple(r) for r in LG.hits(edf.coalesce(1), iterations=3).collect()}
    assert a == b


def test_connected_components(spark):
    edges = [
        ("a.com", "b.com"), ("b.com", "c.com"),   # chain → one component
        ("x.org", "y.org"), ("y.org", "x.org"),   # cycle → one component
        ("solo.net", "solo.net"),                 # self-loop → own island
    ]
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["component"]
        for r in LG.connected_components(edf).collect()
    }
    assert got == {
        "a.com": "a.com", "b.com": "a.com", "c.com": "a.com",
        "x.org": "x.org", "y.org": "x.org",
        "solo.net": "solo.net",
    }


def test_warc_to_linkgraph_end_to_end(spark, tmp_path):
    """Crawl front door to graph back end: a hand-built WARC is read by
    sources.warc, its pages' hrefs extracted, and pagerank ranks the
    tiny site — the full crawl-curation path in one test."""
    from basic_data_pipeline_spark.sources import warc as W

    def record(uri, body):
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + body.encode()
        )
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + b"WARC-Record-ID: <urn:uuid:1>\r\n"
            b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
            + f"Content-Length: {len(payload)}\r\n".encode()
            + b"\r\n"
        )
        return hdr + payload + b"\r\n\r\n"

    data = record(
        "https://s.com/", '<a href="/p1">one</a><a href="/p2">two</a>'
    ) + record(
        "https://s.com/p1", '<a href="/">home</a>'
    ) + record("https://s.com/p2", "<p>leaf</p>")
    f = tmp_path / "mini.warc"
    f.write_bytes(data)
    pages = W.read_warc(spark, str(f))
    links = LG.extract_links(pages)
    got = sorted((r["src"], r["dst"]) for r in links.collect())
    assert got == [
        ("https://s.com/", "https://s.com/p1"),
        ("https://s.com/", "https://s.com/p2"),
        ("https://s.com/p1", "https://s.com/"),
    ]
    ranks = {
        r["node"]: r["rank"]
        for r in LG.pagerank(links, iterations=4).collect()
    }
    # the root is cited by p1 and is the only page with two out-links
    assert ranks["https://s.com/"] == max(ranks.values())


def test_anchor_text_summary(spark):
    links = spark.createDataFrame(
        [
            ("s1", "d1", "Click"),
            ("s1", "d1", "Click"),
            ("s2", "d1", "Docs"),
            ("s2", "d1", ""),       # empty anchors never win top_anchor
            ("s3", "d2", None),     # null-only dst → top_anchor null
            ("s1", "d3", "b"),      # tie on count → lexicographic "a"
            ("s2", "d3", "a"),
        ],
        "src string, dst string, anchor string",
    )
    got = {
        r["dst"]: (r["n_links"], r["n_src"], r["top_anchor"])
        for r in LG.anchor_text_summary(links).collect()
    }
    assert got == {
        "d1": (4, 2, "Click"),
        "d2": (1, 1, None),
        "d3": (2, 2, "a"),
    }


# --- strongly connected components ----------------------------------------

RINGS = [
    # two rings bridged one-way + a DAG tail
    ("a", "b"), ("b", "c"), ("c", "a"),
    ("c", "x"),
    ("x", "y"), ("y", "x"),
    ("y", "t1"), ("t1", "t2"),
]
CHAIN_OF_SCCS = [
    ("a", "b"), ("b", "a"),
    ("b", "c"),
    ("c", "d"), ("d", "c"),
    ("d", "e"),
    ("e", "f"), ("f", "e"),
]


def _scc_dict(spark, edges, **kw):
    edf = spark.createDataFrame(edges, "src string, dst string")
    out = LG.strongly_connected_components(edf, **kw)
    return {r["node"]: r["scc_id"] for r in out.collect()}


@pytest.mark.parametrize(
    "edges",
    [
        TRIANGLE,
        WEB,
        RINGS,
        CHAIN_OF_SCCS,
        [("solo", "solo")],              # self-loop only
        [("a", "b"), ("b", "c")],        # pure DAG: all singletons
    ],
)
def test_scc_matches_tarjan(spark, edges):
    assert _scc_dict(spark, edges) == LG.scc_reference(edges)


def test_scc_round_budget_raises(spark):
    with pytest.raises(LG.SCCNotConverged):
        _scc_dict(spark, CHAIN_OF_SCCS, max_rounds=1)


def _poll_storage_clean(sc, before, tries=50):
    import time

    for _ in range(tries):
        after = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
        if after <= before:
            return after
        time.sleep(0.1)
    return after


def test_scc_failure_frees_checkpoints(spark):
    """SCCNotConverged must not leak the persisted edge layouts or the
    loop's tracked checkpoints (r8 ADVICE): the non-happy exit paths go
    through the same finally cleanup as success."""
    sc = spark.sparkContext
    before = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    with pytest.raises(LG.SCCNotConverged):
        _scc_dict(spark, CHAIN_OF_SCCS, max_rounds=1)
    after = _poll_storage_clean(sc, before)
    assert after <= before


def test_scc_success_frees_checkpoints(spark):
    """On success only the result checkpoint survives; freeing it
    returns storage to the pre-call set."""
    from basic_data_pipeline_spark.caching import free_local_checkpoint

    sc = spark.sparkContext
    before = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    edf = spark.createDataFrame(RINGS, "src string, dst string")
    out = LG.strongly_connected_components(edf)
    out.collect()
    free_local_checkpoint(out)
    after = _poll_storage_clean(sc, before)
    assert after <= before


def test_scc_partitioning_invariance(spark):
    edf = spark.createDataFrame(RINGS, "src string, dst string")
    a = {
        r["node"]: r["scc_id"]
        for r in LG.strongly_connected_components(
            edf.repartition(1)
        ).collect()
    }
    b = {
        r["node"]: r["scc_id"]
        for r in LG.strongly_connected_components(
            edf.repartition(5, "dst")
        ).collect()
    }
    assert a == b


def test_scc_finer_than_wcc(spark):
    """Every SCC sits inside one weakly connected component, and the
    bridged-rings graph has strictly more SCCs than WCCs."""
    edf = spark.createDataFrame(RINGS, "src string, dst string")
    scc = {
        r["node"]: r["scc_id"]
        for r in LG.strongly_connected_components(edf).collect()
    }
    wcc = {
        r["node"]: r["component"]
        for r in LG.connected_components(edf).collect()
    }
    # same scc => same wcc
    for u in scc:
        for v in scc:
            if scc[u] == scc[v]:
                assert wcc[u] == wcc[v]
    assert len(set(scc.values())) > len(set(wcc.values()))


# --- label propagation communities ----------------------------------------

TWO_CLIQUES = [
    ("a", "b"), ("b", "c"), ("a", "c"),
    ("x", "y"), ("y", "z"), ("x", "z"),
    ("c", "x"),  # weak bridge
]


def _lpa_dict(spark, edges, iterations=4):
    edf = spark.createDataFrame(edges, "src string, dst string")
    out = LG.label_propagation(edf, iterations=iterations)
    return {r["node"]: r["label"] for r in out.collect()}


@pytest.mark.parametrize("edges", [TRIANGLE, WEB, RINGS, TWO_CLIQUES])
@pytest.mark.parametrize("iters", [1, 4])
def test_lpa_matches_serial(spark, edges, iters):
    assert _lpa_dict(spark, edges, iters) == LG.label_propagation_reference(
        edges, iters
    )


def test_lpa_two_cliques_split(spark):
    labels = _lpa_dict(spark, TWO_CLIQUES, iterations=4)
    assert labels["a"] == labels["b"] == labels["c"]
    assert labels["x"] == labels["y"] == labels["z"]
    assert labels["a"] != labels["x"]


def test_lpa_isolated_node_keeps_label(spark):
    edges = [("a", "b"), ("c", "c")]  # c only self-loops -> isolated
    labels = _lpa_dict(spark, edges)
    assert labels["c"] == "c"


# --- triangle counting ------------------------------------------------------

def _tri_dict(spark, edges):
    edf = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["node"]: r["triangles"]
        for r in LG.triangle_counts(edf).collect()
    }


@pytest.mark.parametrize(
    "edges",
    [
        TRIANGLE,
        WEB,
        RINGS,
        TWO_CLIQUES,
        [("a", "b"), ("b", "a"), ("a", "b")],  # multi/reciprocal, no tri
        [("x", "x")],                           # self-loop only
        # K4: every node in 3 triangles
        [("a", "b"), ("a", "c"), ("a", "d"),
         ("b", "c"), ("b", "d"), ("c", "d")],
    ],
)
def test_triangles_match_reference(spark, edges):
    want = LG.triangle_counts_reference(edges)
    assert _tri_dict(spark, edges) == want


def test_triangles_partitioning_invariance(spark):
    edf = spark.createDataFrame(TWO_CLIQUES, "src string, dst string")
    a = {r["node"]: r["triangles"]
         for r in LG.triangle_counts(edf.repartition(1)).collect()}
    b = {r["node"]: r["triangles"]
         for r in LG.triangle_counts(edf.repartition(5, "src")).collect()}
    assert a == b


def test_triangles_direction_and_multiplicity_invariant(spark):
    fwd = [("a", "b"), ("b", "c"), ("c", "a")]
    rev = [("b", "a"), ("c", "b"), ("a", "c"), ("a", "c")]
    assert _tri_dict(spark, fwd) == _tri_dict(spark, rev)


# --- coreness ---------------------------------------------------------------

K4_TAIL = [("a", "b"), ("a", "c"), ("a", "d"),
           ("b", "c"), ("b", "d"), ("c", "d"), ("d", "e")]


def _core_dict(spark, edges, **kw):
    edf = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: r["core"] for r in LG.coreness(edf, **kw).collect()}


@pytest.mark.parametrize(
    "edges",
    [TRIANGLE, WEB, RINGS, TWO_CLIQUES, K4_TAIL,
     [("a", "b"), ("b", "c")],     # path: all core 1
     [("x", "x")]],                # self-loop only: no undirected edges
)
def test_coreness_matches_peeling(spark, edges):
    assert _core_dict(spark, edges) == LG.coreness_reference(edges)


def test_coreness_fixed_rounds_replay_matches_converged(spark):
    """Extra rounds past the fixpoint are no-ops — the oracle-replay
    contract."""
    conv = _core_dict(spark, K4_TAIL)
    assert _core_dict(spark, K4_TAIL, iterations=12) == conv


def test_coreness_round_budget_raises(spark):
    with pytest.raises(LG.CorenessNotConverged):
        _core_dict(spark, K4_TAIL, max_iters=1)


def test_coreness_partitioning_invariance(spark):
    edf = spark.createDataFrame(K4_TAIL, "src string, dst string")
    a = {r["node"]: r["core"]
         for r in LG.coreness(edf.repartition(1)).collect()}
    b = {r["node"]: r["core"]
         for r in LG.coreness(edf.repartition(5, "dst")).collect()}
    assert a == b
