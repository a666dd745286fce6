"""Shared synthetic-crawl-graph fixtures for the oracle-checked link
graph arms (pagerank / hits / k-core / triangles / scc / lpa).

Both engines derive the SAME graph from the documents table (each doc
links to (id*31 + j*17) % N for j = 1..3; docs with id % 17 == 0 keep
no out-links and stay dangling; self-loops dropped, edges distinct), so
the DuckDB oracle can replay or cross-check each algorithm hash-exactly.

History: these arms shipped in round 8 inside `text_lang_token`, which
grew to 23 arms with ~80 s of warm per-slot construction at sf0.01
(the eager SCC/LPA/pagerank driver loops run at query CONSTRUCTION) —
one broken arm failed the whole slot and the driver's per-query signal
coarsened (r8 verdict watch-item #1). Round 9 rebalances: the
pagerank/hits/tri/core arms live in `join_salted_skew` and the scc/lpa
arms in `rollup_hourly_to_daily` (both slots had branch headroom),
splitting the graph construction cost across three slots, each well
under the 30 s budget. The CTE text and the Spark edge builder are
shared from here so the two sides can never drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# pagerank arm (r8-close, operators/linkgraph.py): _PG_ITERS rounds of
# INTEGER fixed-point PageRank over the synthetic crawl graph. Every
# step is BIGINT multiply/divide (// in DuckDB, div in Spark; all
# operands non-negative, so floor == truncate), which makes the
# 5-iteration recurrence associative and hash-exact with no rounding
# convention at all — the chained-CTE replay strategy in integers.
# Ranks are micro-units of _PG_SCALE; deg doubles as the dangling
# indicator (deg = 0).
_PG_ITERS = 5
_PG_SCALE = 1_000_000_000_000


def _pg_iter_cte(k: int) -> str:
    return (
        f"pgd{k - 1} AS (SELECT COALESCE(sum(rank), 0) AS dm "
        f"FROM pgit{k - 1} WHERE deg = 0),\n    "
        f"pgit{k} AS (SELECT n.node, n.deg, "
        f"(SELECT tp FROM pgtp) + (85 * (COALESCE(c.contrib, 0) "
        f"+ (SELECT dm FROM pgd{k - 1}) // (SELECT n FROM pgn))) // 100 "
        f"AS rank "
        f"FROM pgnodes n LEFT JOIN ("
        f"SELECT e.dst AS node, sum(r.rank // r.deg) AS contrib "
        f"FROM pge e JOIN pgit{k - 1} r ON e.src = r.node "
        f"GROUP BY e.dst) c ON n.node = c.node)"
    )


# hits arm (r8-close, operators/linkgraph.py): Kleinberg HITS over the
# same synthetic graph — _HITS_ITERS integer power-iteration rounds,
# each half-step renormalized by a POWER-OF-TWO shift derived from the
# half-step's max raw sum (s = max(0, length(bin(max)) - keep_bits)):
# both engines express the shift exactly (bin() exists in Spark and
# DuckDB, and length(bin(0)) = 1 on both), sums stay far from 2^63, and
# every hub/authority score hash-matches with no rounding convention —
# the pagerank arm's strategy with a different normalizer.
_HITS_ITERS = 3
_HITS_BITS = 40


def _hits_iter_cte(k: int) -> str:
    sh = (
        "(1::BIGINT << greatest(length(bin((SELECT mx FROM {m}))) - "
        f"{_HITS_BITS}, 0))"
    )
    return (
        f"atr{k} AS (SELECT e.dst AS node, sum(h.hub) AS raw "
        f"FROM pge e JOIN ht{k - 1} h ON e.src = h.node GROUP BY e.dst),\n"
        f"    atm{k} AS (SELECT COALESCE(max(raw), 0) AS mx FROM atr{k}),\n"
        f"    at{k} AS (SELECT n.node, COALESCE(r.raw, 0) // "
        + sh.format(m=f"atm{k}")
        + f" AS auth FROM pgnodes n LEFT JOIN atr{k} r ON n.node = r.node),\n"
        f"    htr{k} AS (SELECT e.src AS node, sum(a.auth) AS raw "
        f"FROM pge e JOIN at{k} a ON e.dst = a.node GROUP BY e.src),\n"
        f"    htm{k} AS (SELECT COALESCE(max(raw), 0) AS mx FROM htr{k}),\n"
        f"    ht{k} AS (SELECT n.node, COALESCE(r.raw, 0) // "
        + sh.format(m=f"htm{k}")
        + f" AS hub FROM pgnodes n LEFT JOIN htr{k} r ON n.node = r.node)"
    )


_HITS_CTES = ",\n    ".join(
    [f"ht0 AS (SELECT node, (1::BIGINT << {_HITS_BITS}) AS hub FROM pgnodes)"]
    + [_hits_iter_cte(k) for k in range(1, _HITS_ITERS + 1)]
)


# the shared graph itself (node count + distinct edge set) — the only
# CTEs every arm family needs; kept separate so a slot carrying only
# scc/lpa doesn't drag the pagerank iteration CTEs into its oracle
_EDGE_CTES = ",\n    ".join(
    [
        "pgn AS (SELECT count(*) AS n FROM documents)",
        """pge AS MATERIALIZED (SELECT DISTINCT doc_id AS src,
               (doc_id*31 + j*17) % (SELECT n FROM pgn) AS dst
        FROM documents, (VALUES (1), (2), (3)) AS jj(j)
        WHERE doc_id % 17 <> 0
          AND (doc_id*31 + j*17) % (SELECT n FROM pgn) <> doc_id)""",
    ]
)

_PG_CTES = ",\n    ".join(
    [
        _EDGE_CTES,
        "pgdeg AS (SELECT src, count(*) AS deg FROM pge GROUP BY src)",
        """pgnodes AS MATERIALIZED (SELECT d.doc_id AS node, COALESCE(g.deg, 0) AS deg
        FROM documents d LEFT JOIN pgdeg g ON d.doc_id = g.src)""",
        f"pgtp AS (SELECT (15 * ({_PG_SCALE} // (SELECT n FROM pgn)))"
        " // 100 AS tp)",
        f"pgit0 AS (SELECT node, deg, {_PG_SCALE} // (SELECT n FROM pgn)"
        " AS rank FROM pgnodes)",
    ]
    + [_pg_iter_cte(k) for k in range(1, _PG_ITERS + 1)]
)


# scc arm (r8 cont., operators/linkgraph.py): strongly connected
# components of the same synthetic crawl graph as the pagerank arm.
# The Spark side runs the REAL distributed FW-BW decomposition (trim /
# forward min-coloring / backward sweep); the oracle derives the same
# labeling from an INDEPENDENT formulation — WITH RECURSIVE transitive
# closure, then scc_id(v) = min over {v} ∪ {u : v↔u mutually reachable}
# — so the two algorithms cross-check rather than replaying each other.
# Node universe = src ∪ dst of the edge set (the operator's contract).
_SCC_CTES = """sccreach AS (
      SELECT src, dst FROM pge
      UNION
      SELECT r.src, e.dst FROM sccreach r JOIN pge e ON r.dst = e.src),
    sccn AS MATERIALIZED (SELECT DISTINCT node FROM
               (SELECT src AS node FROM pge
                UNION ALL SELECT dst FROM pge) tt),
    sccp AS MATERIALIZED (SELECT a.src AS u, a.dst AS v
             FROM sccreach a JOIN sccreach b
               ON a.src = b.dst AND a.dst = b.src),
    sccl AS (SELECT n.node,
                    least(n.node, COALESCE(min(p.v), n.node)) AS scc_id
             FROM sccn n LEFT JOIN sccp p ON n.node = p.u
             GROUP BY n.node)"""

# lpa arm (r8 cont., operators/linkgraph.py): deterministic synchronous
# label propagation (ties -> smallest label) over the symmetrized graph,
# _LPA_ITERS fixed rounds replayed CTE-by-CTE (the pagerank strategy —
# same recurrence, both engines, integer labels, no rounding at all).
_LPA_ITERS = 3


def _lpa_iter_cte(k: int) -> str:
    return (
        f"lpa{k} AS (SELECT p.node, COALESCE(b.label, p.label) AS label "
        f"FROM lpa{k - 1} p LEFT JOIN ("
        f"SELECT node, label FROM ("
        f"SELECT u.d AS node, q.label, "
        f"row_number() OVER (PARTITION BY u.d "
        f"ORDER BY count(*) DESC, q.label ASC) AS rn "
        f"FROM lpau u JOIN lpa{k - 1} q ON u.s = q.node "
        f"GROUP BY u.d, q.label) t WHERE rn = 1) b ON b.node = p.node)"
    )


_LPA_CTES = ",\n    ".join(
    [
        "lpau AS MATERIALIZED (SELECT src AS s, dst AS d FROM pge WHERE src <> dst "
        "UNION ALL SELECT dst, src FROM pge WHERE src <> dst)",
        "lpa0 AS (SELECT node, node AS label FROM sccn)",
    ]
    + [_lpa_iter_cte(k) for k in range(1, _LPA_ITERS + 1)]
)

# tri arm (r8 cont., operators/linkgraph.py): per-node triangle counts
# of the synthetic graph, degree orientation replayed verbatim (integer
# counts, hash-exact) — the link-farm / clustering-coefficient signal.
_TRI_CTES = """triu AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
                    greatest(src, dst) AS b FROM pge WHERE src <> dst),
    trisym AS MATERIALIZED (SELECT a, b FROM triu UNION ALL SELECT b, a FROM triu),
    trideg AS MATERIALIZED (SELECT a AS node, count(*) AS deg FROM trisym GROUP BY a),
    trior AS MATERIALIZED (SELECT s.a AS u, s.b AS v FROM trisym s
              JOIN trideg x ON s.a = x.node
              JOIN trideg y ON s.b = y.node
              WHERE x.deg < y.deg OR (x.deg = y.deg AND s.a < s.b)),
    triw AS (SELECT w1.u AS x, w1.v AS y, w2.v AS z
             FROM trior w1 JOIN trior w2 ON w1.v = w2.u),
    trit AS (SELECT x, y, z FROM triw WHERE EXISTS
               (SELECT 1 FROM trior o
                WHERE o.u = triw.x AND o.v = triw.z)),
    trin AS (SELECT node, count(*) AS tri FROM
               (SELECT x AS node FROM trit
                UNION ALL SELECT y FROM trit
                UNION ALL SELECT z FROM trit) tt GROUP BY node),
    tril AS MATERIALIZED (SELECT d.node, COALESCE(t.tri, 0) AS tri
             FROM trideg d LEFT JOIN trin t ON d.node = t.node)"""

# core arm (r8 cont., operators/linkgraph.py): k-core numbers via the
# h-index iteration, _CORE_ITERS fixed rounds replayed CTE-by-CTE (the
# replay contract: rounds past the fixpoint are no-ops, so both engines
# match bit-for-bit whether or not 8 rounds suffice to converge; true
# coreness == serial peeling is pinned in tests/test_linkgraph.py).
_CORE_ITERS = 8


def _core_iter_cte(k: int) -> str:
    return (
        f"cor{k} AS (SELECT node, max(least(rn, nv)) AS core FROM ("
        f"SELECT u.b AS node, c.core AS nv, "
        f"row_number() OVER (PARTITION BY u.b ORDER BY c.core DESC) AS rn "
        f"FROM coru u JOIN cor{k - 1} c ON u.a = c.node) t GROUP BY node)"
    )


_CORE_CTES = ",\n    ".join(
    [
        "coru AS MATERIALIZED (SELECT DISTINCT a, b FROM ("
        "SELECT src AS a, dst AS b FROM pge WHERE src <> dst "
        "UNION ALL SELECT dst, src FROM pge WHERE src <> dst) tt)",
        "cor0 AS (SELECT a AS node, count(*) AS core FROM coru GROUP BY a)",
    ]
    + [_core_iter_cte(k) for k in range(1, _CORE_ITERS + 1)]
)


def synthetic_crawl_edges(docs: DataFrame) -> DataFrame:
    """(src, dst) — the Spark side of the synthetic crawl graph both
    engines derive from the documents table (see the module docstring
    for the construction). ``docs`` needs a ``doc_id`` column."""
    cnt = docs.agg(F.count("*").alias("_n"))
    return (
        docs.select("doc_id")
        .crossJoin(F.broadcast(cnt))
        .filter(F.col("doc_id") % 17 != 0)
        .select(
            "doc_id",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("_j"),
            "_n",
        )
        .select(
            F.col("doc_id").alias("src"),
            F.expr("(doc_id * 31 + _j * 17) % _n").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
