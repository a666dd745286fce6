"""Sparse text retrieval: inverted-index BM25 top-k and
reciprocal-rank fusion (hybrid retrieval).

The corpus-curation recipes this engine targets use lexical retrieval as
a first-class primitive: retrieval-based decontamination (pull the
benchmark's nearest training docs before judging overlap), hard-negative
mining for embedding training, and hybrid (sparse + dense) search where
BM25 ranks are fused with ANN cosine ranks. The reference provisions the
analytics store these queries would run on (spark.sh:17-27) but commits
no retrieval code; this module is the Spark-first formulation:

- ``bm25_topk`` builds the postings relationally — (doc, term, tf) via
  one explode + groupBy, document frequency via one groupBy(term) — and
  scores ONLY the postings that match a query term: the query term set
  is broadcast, so the corpus-side scan is pruned by a broadcast
  semi-join before any scoring work, and no score is ever computed for a
  (query, doc) pair without a shared term. That is exactly the
  term-at-a-time inverted-index plan, expressed as joins Catalyst can
  push around. Every shuffle is keyed and linear: (doc,term) partials,
  term-keyed df agg, (query,doc) score agg, query-keyed top-k window.
- ``rrf_fuse`` merges any number of (query_id, neighbor_id, rank) lists
  with reciprocal-rank fusion (Cormack et al.: score = Σ 1/(k+rank)) —
  the standard way to combine BM25 with dense ANN ranks without score
  calibration.
- ``rank_metrics`` / ``mine_hard_negatives`` close the loop: grade any
  rank list against truth (recall@k, MRR@k), and turn a rank list plus
  known positives into DPR-style hard negatives — both linear in the
  lists, never corpus-sized.

Cross-engine determinism (the DuckDB oracle reruns both operators as
SQL): per-term BM25 contributions and per-list RRF contributions are
rounded at 6 places — absorbing ln()/division ULP differences between
libms — then summed EXACTLY as DECIMAL(18,6), so the fused totals and
therefore the ranks are engine-independent. Ties break on neighbor id.

Scale notes (100 TB): the postings build and df aggregation are one
linear shuffle each with map-side partials; stopword-like terms make the
term-keyed df shuffle skewed AND blow up the candidate space, so
``max_df_frac`` prunes terms appearing in more than that fraction of
docs (the classic maxdf cut) — at web scale this is the difference
between |query terms| × avg-postings-length candidates and touching
half the corpus per query. The broadcast of the query term set assumes a
bounded query batch (retrieval APIs are driven by ≤ millions of queries,
not by the corpus); for corpus-sized query sets drop the broadcast hint
and let AQE pick a shuffle join on term.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from basic_data_pipeline_spark.operators import text

# one division per (list, rank) then exact decimal sums: engine-independent
_DEC = "decimal(18,6)"


def _clean_tokens(col: Column) -> Column:
    """Lower-cased whitespace tokens with empties dropped (a leading
    space yields a '' token in both Spark and DuckDB split semantics)."""
    return F.filter(text.tokens(col), lambda t: F.length(t) > 0)


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float | None = None,
    exclude_self: bool = False,
) -> DataFrame:
    """(query_id, neighbor_id, rank, score): top-k docs per query by
    BM25 (Lucene variant: idf = ln(1 + (N - df + .5)/(df + .5)), always
    positive). Query-side term frequency is ignored (terms deduped), the
    standard short-query simplification.

    ``max_df_frac`` drops terms whose document frequency exceeds that
    fraction of the corpus (maxdf stopword cut — kills both the skewed
    hot-term shuffle and the useless candidates). ``exclude_self`` drops
    neighbor_id == query_id (for query-by-document workloads where the
    ids share a namespace). ``score`` is the exact DECIMAL(18,6) sum of
    round-6 per-term contributions — deterministic under any
    partitioning."""
    # query side: deduped terms, broadcast (bounded query batch) so the
    # token stream is pruned to matching terms before any aggregation
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(
            F.array_distinct(_clean_tokens(F.col(query_text_col)))
        ).alias("term"),
    )

    # corpus side: one row per (doc, query-matched term) with tf; dl
    # projected from the doc row itself (no extra shuffle — it rides
    # through the groupBy key because dl is functional on doc_id). The
    # broadcast term prune sits BELOW the postings aggregate (r12):
    # only query-matched token rows enter the exchange, so the shuffle
    # is ∝ matched tokens, not corpus tokens (guide §2.3 — filter
    # before you shuffle). tf/df for the surviving terms are identical:
    # the prune is an equi-filter on the aggregation key.
    toks = docs.select(
        F.col(id_col).alias("neighbor_id"),
        F.size(_clean_tokens(F.col(text_col))).alias("dl"),
        F.explode(_clean_tokens(F.col(text_col))).alias("term"),
    )
    post_q = toks.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    ).groupBy("neighbor_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )

    # corpus stats: exact integer sums, ONE division → bit-identical
    # across engines (never avg() of doubles, whose partial-sum order is
    # engine-dependent). Computed over ALL docs (df's maxdf cut and the
    # bm25 normalization need the true corpus size, not the pruned one).
    stats = docs.select(
        F.size(_clean_tokens(F.col(text_col))).alias("dl")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )

    # Single-pass contribution join (r12): document frequency is
    # aggregated from the QUERY-PRUNED postings and joined back on the
    # same key — both sides of the df join hang off one exchange of
    # `post_q` hash-partitioned by term, which Spark's ReuseExchange
    # dedups, so the tokenize → postings aggregate runs ONCE. The r11
    # shape aggregated df over the FULL vocabulary and broadcast it,
    # which re-ran the whole tokenize+postings subtree as a separate
    # broadcast-build job (guide §2.4: remove duplicate passes). df is
    # counted over pruned postings only for terms the queries contain —
    # exactly the terms the inner contribution join keeps anyway.
    dfreq = post_q.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_df_frac is not None:
        dfreq = dfreq.join(F.broadcast(stats), how="cross").filter(
            F.col("df") <= F.col("n_docs") * F.lit(max_df_frac)
        ).select("term", "df")

    contrib = (
        post_q.join(dfreq, "term")
        .join(F.broadcast(qterms), "term")
        .join(F.broadcast(stats), how="cross")
        .select(
            "query_id",
            "neighbor_id",
            bm25_contribution(k1, b).alias("c"),
        )
    )
    if exclude_self:
        contrib = contrib.filter(F.col("query_id") != F.col("neighbor_id"))

    scored = contrib.groupBy("query_id", "neighbor_id").agg(
        F.sum("c").alias("score")
    )
    return ranked_topk(scored, k)


def bm25_contribution(k1: float, b: float) -> Column:
    """The per-(query term, posting) BM25 contribution — Lucene idf ×
    saturated tf, rounded at 6 places and cast to DECIMAL(18,6) — over
    input columns (tf, dl, df, n_docs, sum_dl). ONE expression tree
    shared by the one-shot operator above and the persisted-index search
    (operators/incremental_retrieval.py): byte-identical expressions are
    what make index-backed scores exactly equal to one-shot scores (and
    keep the pinned one-shot plan fingerprint stable)."""
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    tf_part = (
        F.col("tf") * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
        )
    )
    return F.round(idf * tf_part, 6).cast(_DEC)


def ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    """(query_id, neighbor_id, rank, score) top-k per query from scored
    pairs — score desc, neighbor id as the deterministic tiebreak."""
    w = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def rrf_fuse(
    rank_lists: dict[str, DataFrame],
    k: int,
    *,
    k_rrf: int = 60,
) -> DataFrame:
    """(query_id, neighbor_id, rank, n_lists, score): reciprocal-rank
    fusion of named (query_id, neighbor_id, rank) lists — score =
    Σ_lists 1/(k_rrf + rank), re-ranked per query, top-k kept.

    Each list's contribution is one IEEE division rounded at 6 places
    and the fusion is an exact DECIMAL sum, so fused ranks are identical
    across engines and partitionings. ``n_lists`` reports how many input
    lists voted for the pair (a useful hybrid-retrieval diagnostic: 1 =
    sparse-only or dense-only, 2 = both). Input ranks are trusted as
    dense per-query ranks (the shape bm25_topk / similarity.topk_neighbors
    emit); lists are unioned, never joined, so N lists cost one union +
    one keyed agg, not N-1 outer joins."""
    tagged = None
    for name, df in rank_lists.items():
        part = df.select(
            "query_id",
            "neighbor_id",
            F.round(F.lit(1.0) / (F.lit(k_rrf) + F.col("rank")), 6)
            .cast(_DEC)
            .alias("c"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    if tagged is None:
        raise ValueError("rrf_fuse needs at least one rank list")

    fused = tagged.groupBy("query_id", "neighbor_id").agg(
        F.sum("c").alias("score"), F.count(F.lit(1)).alias("n_lists")
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "n_lists", "score")
    )


def rank_metrics(
    results: DataFrame,
    truth: DataFrame,
    k: int,
) -> DataFrame:
    """(query_id, n_truth, hits, recall, mrr): per-query retrieval
    quality of a (query_id, neighbor_id, rank) result list against a
    (query_id, neighbor_id[, rank]) ground-truth list — recall@k (truth
    neighbors found in the top-k, over truth size capped at k) and
    MRR@k (reciprocal rank of the FIRST truth neighbor found, 0 when
    none). The evaluation face of the retrieval surface: ANN recall
    floors, BM25-vs-exact comparisons, hybrid-fusion lift — every tier
    of the serving stack grades against the same frame shape it emits.

    Plan shape: the result list is cut to rank ≤ k, one equi-join on
    (query_id, neighbor_id) marks hits, two keyed aggregations produce
    the per-query row — everything ∝ |results| + |truth|, nothing
    corpus-sized. Queries present in ``truth`` but absent from
    ``results`` still appear (zero recall), the convention that keeps
    macro-averages honest when a retriever returns nothing. The ratios
    are single divisions of exact integer counts (engine-reproducible);
    mrr is 1/rank of one row."""
    t = truth.select(
        "query_id", F.col("neighbor_id").alias("_tn")
    ).distinct()
    topk = results.filter(F.col("rank") <= k).select(
        "query_id", "neighbor_id", "rank"
    )
    marked = t.join(
        topk,
        (t["query_id"] == topk["query_id"])
        & (t["_tn"] == topk["neighbor_id"]),
        "left",
    ).select(t["query_id"], "_tn", "rank")
    per_q = marked.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.count("rank").alias("hits"),
        F.min("rank").alias("_first"),
    )
    denom = F.least(F.col("n_truth"), F.lit(k))
    return per_q.select(
        "query_id",
        "n_truth",
        "hits",
        (F.col("hits") / denom).alias("recall"),
        F.coalesce(
            F.lit(1.0) / F.col("_first"), F.lit(0.0)
        ).alias("mrr"),
    )


def mine_hard_negatives(
    results: DataFrame,
    positives: DataFrame,
    n: int,
) -> DataFrame:
    """(query_id, neighbor_id, neg_rank): the ``n`` highest-ranked
    retrieved neighbors per query that are NOT known positives — the
    DPR-style hard negatives contrastive embedding training mines from
    a lexical retriever (retrieved-but-wrong beats random-negative).
    ``results`` is any (query_id, neighbor_id, rank) list (one-shot
    bm25_topk, the persisted-index search, or a hybrid fusion);
    ``positives`` is (query_id, neighbor_id) ground truth. Over-fetch
    the result list (k ≥ n + expected positives) so dropping positives
    still leaves n rows.

    One anti-join on (query_id, neighbor_id) + one per-query re-rank
    window over the ≤k surviving rows — both bounded by the result-list
    size, never the corpus."""
    pos = positives.select("query_id", "neighbor_id").distinct()
    negs = results.join(pos, ["query_id", "neighbor_id"], "left_anti")
    w = W.partitionBy("query_id").orderBy(F.col("rank").asc())
    return (
        negs.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= n)
        .select("query_id", "neighbor_id", "neg_rank")
    )
