"""Property-based fuzz for the LLM-pipeline surface (hypothesis): the
operators previously pinned only on fixtures — line dedup, token-window
packing, fuzzy pairing, substring dedup — each swept against a serial
Python reference over randomized corpora. Small max_examples (every
example is a full Spark plan), adversarial generators (tiny vocab /
alphabet so collisions and duplicates actually occur)."""

from __future__ import annotations

import pytest

#: slow tier (r12): hypothesis fuzz of the LLM-op surface; the ops' example-based pins live in test_llm_ops.py
pytestmark = pytest.mark.slow

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import dedup, packing, substring
from basic_data_pipeline_spark.operators.entity import fuzzy_pairs
from tests.test_substring import serial_substring_dedup

_SET = dict(max_examples=6, deadline=None,
            suppress_health_check=list(HealthCheck))


# --- line dedup ----------------------------------------------------------

_LINE_POOL = ["the quick fox", "copyright footer", "alpha beta", "x y z",
              "subscribe now", "lorem ipsum dolor"]
_line = st.one_of(
    st.sampled_from(_LINE_POOL),
    st.lists(st.sampled_from("abc"), min_size=0, max_size=4).map(" ".join),
)
_corpus = st.lists(
    st.lists(_line, min_size=1, max_size=6).map("\n".join),
    min_size=1,
    max_size=8,
)


def _serial_line_dedup(corpus, mode, max_doc_freq=2):
    lines = {d: corpus[d].split("\n") for d in range(len(corpus))}
    docs_of = {}
    first = {}
    for d in sorted(lines):
        for i, ln in enumerate(lines[d]):
            docs_of.setdefault(ln, set()).add(d)
            first.setdefault(ln, (d, i))
    out = {}
    for d in sorted(lines):
        if mode == "drop_common":
            kept = [ln for ln in lines[d] if len(docs_of[ln]) <= max_doc_freq]
        else:
            kept = [
                ln
                for i, ln in enumerate(lines[d])
                if first[ln] == (d, i)
            ]
        if kept:
            out[d] = "\n".join(kept)
    return out


@settings(**_SET)
@given(corpus=_corpus, mode=st.sampled_from(["drop_common", "keep_first"]))
def test_line_dedup_matches_serial(spark, corpus, mode):
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["text"]
        for r in dedup.line_dedup_corpus(df, mode=mode).collect()
    }
    assert got == _serial_line_dedup(corpus, mode)


# --- token-window packing ------------------------------------------------

_doc_text = st.lists(
    st.sampled_from(["Alpha", "beta", "GAMMA", "d", "ee"]),
    min_size=1,
    max_size=12,
).map(" ".join)


@settings(**_SET)
@given(
    texts=st.lists(_doc_text, min_size=1, max_size=8),
    seq_len=st.integers(min_value=2, max_value=9),
)
def test_pack_token_windows_matches_serial(spark, texts, seq_len):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["seq_bin"]: (r["n_tokens"], r["n_docs"], list(r["tokens"]))
        for r in packing.pack_token_windows(
            df, "doc_id", "text", seq_len
        ).collect()
    }
    # serial: the global token stream in doc_id order, cut every seq_len
    stream = []
    for d in range(len(texts)):
        for tok in re.split(r"\s+", texts[d].lower()):
            stream.append((d, tok))
    want = {}
    for b in range(0, len(stream), seq_len):
        w = stream[b : b + seq_len]
        want[b // seq_len] = (
            len(w),
            len({d for d, _ in w}),
            [t for _, t in w],
        )
    assert got == want


# --- fuzzy pairing -------------------------------------------------------

def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


_name = st.text(alphabet="ab ", min_size=0, max_size=8)


@settings(**_SET)
@given(
    names=st.lists(_name, min_size=2, max_size=14, unique=True),
    k=st.integers(min_value=1, max_value=2),
)
def test_fuzzy_pairs_matches_bruteforce(spark, names, k):
    rows = list(enumerate(names))
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_pairs(df, "id", "name", max_edit=k).collect()
    }
    norm = {i: n.strip().lower() for i, n in rows}
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            d = _lev(norm[i], norm[j])
            if d <= k:
                want.add((i, j, d))
    assert got == want


# --- substring dedup -----------------------------------------------------

_sub_doc = st.lists(
    st.sampled_from("pqr"), min_size=1, max_size=14
).map(" ".join)


@settings(**_SET)
@given(
    texts=st.lists(_sub_doc, min_size=1, max_size=6),
    k=st.integers(min_value=2, max_value=4),
)
def test_substring_dedup_matches_serial(spark, texts, k):
    corpus = dict(enumerate(texts))
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["text"]
        for r in substring.substring_dedup_corpus(df, k=k).collect()
    }
    assert got == serial_substring_dedup(corpus, k)


@settings(max_examples=4, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(_sub_doc, min_size=2, max_size=6),
    cut=st.integers(min_value=1, max_value=5),
    k=st.integers(min_value=2, max_value=3),
)
def test_incremental_substring_random_split_equals_oneshot(
    spark, tmp_path_factory, texts, cut, k
):
    """ANY split point: corpus-prefix indexed one-shot, suffix fed as an
    increment — the union of outputs equals the one-shot dedup of the
    whole corpus (the prefix-stability property the module contract
    claims, swept over random corpora and split points)."""
    from basic_data_pipeline_spark.operators import incremental_substring as IS

    corpus = dict(enumerate(texts))
    cut = min(cut, len(texts) - 1)
    head = {d: t for d, t in corpus.items() if d < cut}
    tail = {d: t for d, t in corpus.items() if d >= cut}
    if not head or not tail:
        return
    idx = str(tmp_path_factory.mktemp("sidx"))
    df_h = spark.createDataFrame(list(head.items()), "doc_id long, text string")
    df_t = spark.createDataFrame(list(tail.items()), "doc_id long, text string")
    out_h = {
        r["doc_id"]: r["text"]
        for r in IS.build_substring_index(spark, df_h, idx, k=k).collect()
    }
    out_t = {
        r["doc_id"]: r["text"]
        for r in IS.incremental_substring_dedup(spark, df_t, idx).collect()
    }
    assert {**out_h, **out_t} == serial_substring_dedup(corpus, k)


# --- DSIR importance weights --------------------------------------------

from tests.test_selection import _serial_log_weights, N_BUCKETS as _DSIR_B

_dsir_doc = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zz"]),
    min_size=1, max_size=8,
).map(" ".join)


@settings(**_SET)
@given(
    raw=st.lists(_dsir_doc, min_size=2, max_size=8),
    tgt=st.lists(_dsir_doc, min_size=1, max_size=3),
)
def test_dsir_weights_match_serial(spark, raw, tgt):
    """Random tiny-vocab corpora: Spark's exact-DECIMAL DSIR log-weights
    equal the pure-python reference bit-for-bit (hash buckets collide on
    purpose at 64 buckets)."""
    from decimal import Decimal

    from basic_data_pipeline_spark.operators import selection

    raw_rows = list(enumerate(raw))
    tgt_rows = [(100 + i, t) for i, t in enumerate(tgt)]
    rdf = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tdf = spark.createDataFrame(tgt_rows, "doc_id long, text string")
    rc = selection.hashed_ngram_counts(rdf, "doc_id", "text", _DSIR_B)
    tc = selection.hashed_ngram_counts(tdf, "doc_id", "text", _DSIR_B)
    lam = selection.importance_log_ratios(tc, rc, _DSIR_B)
    got = {
        r["doc_id"]: Decimal(r["log_w"])
        for r in selection.importance_log_weights(rc, lam, "doc_id").collect()
    }
    want = _serial_log_weights(raw_rows, tgt_rows)
    assert got == want


# --- token-budget mixing (operators/sampling.py) ---------------------------

from tests.test_sampling import _serial_token_budget


@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=999),   # id (deduped below)
            st.integers(min_value=0, max_value=3),     # source idx
            st.integers(min_value=0, max_value=9),     # token count
        ),
        min_size=1,
        max_size=40,
    ),
    budgets=st.lists(
        st.integers(min_value=0, max_value=25), min_size=4, max_size=4
    ),
    parts=st.integers(min_value=1, max_value=5),
)
@settings(**_SET)
def test_token_budget_mix_matches_serial(spark, docs, budgets, parts):
    """The group-generalized two-phase prefix sum == the serial
    md5-order greedy fill for random corpora, budgets (including 0),
    and partition counts — partition boundaries falling inside a
    source's order must never shift the kept set."""
    from basic_data_pipeline_spark.operators.sampling import (
        token_budget_mix,
    )

    rows = []
    seen = set()
    for i, s, n in docs:
        if i in seen:
            continue
        seen.add(i)
        rows.append((i, f"s{s}", " ".join(["tok"] * n) if n else ""))
    bud = {f"s{i}": b for i, b in enumerate(budgets)}
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    ntok = F.size(
        F.filter(
            F.split(F.lower(F.col("text")), r"\s+"),
            lambda t: F.length(t) > 0,
        )
    )
    got = {
        r["doc_id"]
        for r in token_budget_mix(df, bud, ntok, parts=parts).collect()
    }
    serial_rows = [
        (i, s, len([t for t in txt.split() if t])) for i, s, txt in rows
    ]
    assert got == _serial_token_budget(serial_rows, bud)


# --- integer pagerank ------------------------------------------------------

_pg_edges = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).map(
        lambda t: (f"n{t[0]}", f"n{t[1]}")
    ),
    min_size=0,
    max_size=20,
)
_pg_weights = st.dictionaries(
    st.integers(0, 9).map(lambda i: f"n{i}"),
    st.integers(0, 5),
    max_size=6,
)


@settings(**_SET)
@given(
    edges=_pg_edges,
    extra_nodes=st.sets(st.integers(0, 9).map(lambda i: f"n{i}"), max_size=5),
    iters=st.integers(0, 3),
    weights=st.one_of(st.none(), _pg_weights),
)
def test_fuzz_pagerank_matches_serial(spark, edges, extra_nodes, iters, weights):
    """Integer fixed-point pagerank == the serial reference EXACTLY on
    random multigraphs (self-loops, parallel edges, dangling nodes,
    isolated nodes, zero-weight nodes) — no float tolerance. Skips the
    degenerate no-teleport-mass case the operator refuses by contract."""
    from basic_data_pipeline_spark.operators import linkgraph as LG

    node_list = sorted(
        {s for s, _ in edges} | {d for _, d in edges} | extra_nodes
    )
    if not node_list:
        return
    if weights is not None and sum(weights.get(v, 0) for v in node_list) <= 0:
        return  # ValueError by contract; pinned in test_linkgraph.py
    edf = spark.createDataFrame(
        edges or [], "src string, dst string"
    )
    ndf = spark.createDataFrame([(v,) for v in node_list], "node string")
    wdf = (
        spark.createDataFrame(list(weights.items()), "node string, weight long")
        if weights is not None
        else None
    )
    got = {
        r["node"]: (r["rank"], r["out_deg"])
        for r in LG.pagerank(
            edf, nodes=ndf, iterations=iters, teleport_weights=wdf
        ).collect()
    }
    want = LG.pagerank_reference(
        edges, node_list, iterations=iters, weights=weights
    )
    assert got == want


@settings(**_SET)
@given(
    edges=_pg_edges,
    extra_nodes=st.sets(st.integers(0, 9).map(lambda i: f"n{i}"), max_size=5),
    iters=st.integers(0, 3),
)
def test_fuzz_hits_matches_serial(spark, edges, extra_nodes, iters):
    """Integer HITS == the serial reference EXACTLY on random
    multigraphs — hub/authority scores, power-of-two renormalizer and
    all."""
    from basic_data_pipeline_spark.operators import linkgraph as LG

    node_list = sorted(
        {s for s, _ in edges} | {d for _, d in edges} | extra_nodes
    )
    if not node_list:
        return
    edf = spark.createDataFrame(edges or [], "src string, dst string")
    ndf = spark.createDataFrame([(v,) for v in node_list], "node string")
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in LG.hits(edf, nodes=ndf, iterations=iters).collect()
    }
    assert got == LG.hits_reference(edges, node_list, iterations=iters)


# --- graph analytics: scc / lpa / triangles / coreness ---------------------


@settings(**_SET)
@given(edges=_pg_edges)
def test_fuzz_scc_matches_tarjan(spark, edges):
    """Distributed FW-BW SCC == iterative Tarjan on random multigraphs
    (self-loops, parallel edges, chains of tiny SCCs)."""
    from basic_data_pipeline_spark.operators import linkgraph as LG

    if not edges:
        return
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["scc_id"]
        for r in LG.strongly_connected_components(edf).collect()
    }
    assert got == LG.scc_reference(edges)


@settings(**_SET)
@given(edges=_pg_edges, iters=st.integers(1, 3))
def test_fuzz_lpa_matches_serial(spark, edges, iters):
    from basic_data_pipeline_spark.operators import linkgraph as LG

    if not edges:
        return
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["label"]
        for r in LG.label_propagation(edf, iterations=iters).collect()
    }
    assert got == LG.label_propagation_reference(edges, iters)


@settings(**_SET)
@given(edges=_pg_edges)
def test_fuzz_triangles_and_coreness_match_serial(spark, edges):
    """Degree-oriented triangle counts == brute force AND converged
    h-index coreness == serial peeling, on the same random graphs (the
    two density signals share the symmetrized-simple-graph semantics)."""
    from basic_data_pipeline_spark.operators import linkgraph as LG

    if not edges:
        return
    edf = spark.createDataFrame(edges, "src string, dst string")
    tri = {
        r["node"]: r["triangles"]
        for r in LG.triangle_counts(edf).collect()
    }
    assert tri == LG.triangle_counts_reference(edges)
    core = {r["node"]: r["core"] for r in LG.coreness(edf).collect()}
    assert core == LG.coreness_reference(edges)


# --- Kneser-Ney LM ----------------------------------------------------------

_kn_word = st.integers(0, 5).map(lambda i: f"w{i}")
_kn_docs = st.lists(
    st.lists(_kn_word, min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=6,
)


@settings(**_SET)
@given(texts=_kn_docs, split=st.integers(2, 4))
def test_fuzz_knlm_matches_serial(spark, texts, split):
    """Distributed interpolated-KN scoring == the serial reference
    term-for-term (exact DECIMAL sums) on random corpora with a random
    train/score split — OOV backstop included when the split hides
    vocabulary."""
    from tests.test_ngramlm import kn_reference
    from basic_data_pipeline_spark.operators import ngramlm

    corpus = dict(enumerate(texts))
    train = {i: t for i, t in corpus.items() if i % split != 0}
    if not train:
        return
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    tdf = spark.createDataFrame(
        list(train.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_backstop"], r["sum_lp"])
        for r in ngramlm.kneser_ney_lm_scores(docs, train=tdf).collect()
    }
    assert got == kn_reference(corpus, train)
