"""Incremental BM25 retrieval against a persisted inverted index.

The retrieval sibling of operators/incremental.py (LSH dedup index) and
operators/incremental_substring.py (gram index): ``bm25_topk``
(operators/retrieval.py) rebuilds postings and corpus statistics from
the corpus on every call — right for one-shot analytics, wrong for the
serving/decontamination loop where the corpus arrives continuously and
queries are cheap. Here the corpus is indexed ONCE, every arriving
batch folds in at INCREMENT cost, and a search touches the index, never
the corpus text. The reference provisions the analytics store this
would serve from (spark.sh:17-27) but commits no retrieval code; this
is the Spark-first formulation of a Lucene-style inverted index as
three parquet tables.

Index layout under ``index_path``:

  postings/  (term, neighbor_id, dl, tf) — one row per (document,
             term), BUCKETED and SORTED by term: a search's term-lookup
             predicate reaches the parquet scan as a pushed filter, and
             the sort gives row-group min/max pruning INSIDE each
             bucket — the columnar re-expression of "seek the postings
             list for this term". Appends are bucketed writes of the
             increment only.
  dfreq/     (term, df, _wm) — ADDITIVE document-frequency deltas,
             bucketed by term: build writes the base counts, every
             increment appends its batch's per-term counts, and a
             search sums the (query-term-pruned) deltas. |distinct
             terms|-sized, never corpus-sized.
  stats/     (n_docs, sum_dl, _wm) — one tiny additive row per
             build/append; a search sums them into the exact global
             (N, Σdl) the one-shot operator would compute.
  _meta.json — id_col/text_col, bucket spec, base-corpus max id.

``_wm`` is the writing batch's max document id — the same monotone-id
watermark convention as every incremental index here, and what makes a
mid-append crash recoverable by ONE filtered rewrite per table
(streaming/rebuild.py rebuild_retrieval_index): completed rows have
watermark ≤ the ledger's completed-epoch max id, partial rows sit above
it. Postings rows carry the watermark implicitly in ``neighbor_id``.

Equivalence contract (tested in tests/test_incremental_retrieval.py):
``search_retrieval_index`` over an index built as ANY batch split
returns EXACTLY what ``bm25_topk`` returns over the concatenated
corpus — ranks and scores. That is exact, not approximate: tf/dl/df/N/
Σdl are integers summed exactly under any split, and the per-term
double arithmetic is the SAME expression tree
(retrieval.bm25_contribution) rounded at 6 places then summed as
DECIMAL(18,6). BM25 is order-free, so unlike the dedup indexes no
first-occurrence reasoning is needed — monotone ids are required only
by the crash-recovery watermark.

Scale notes (100 TB): an append shuffles ONLY the increment (one
(doc,term) partial agg + two bucketed writes + one driver-sized stats
row); a search never re-reads or re-shuffles the corpus — the bounded
query batch's term set is collected (retrieval APIs are driven by ≤
millions of queries, not by the corpus) and pushed into the postings
scan as a term predicate, df comes from the pruned delta log, and the
only shuffles are on (query_id, neighbor_id) — candidate-sized, exactly
the shuffles the one-shot operator pays AFTER its corpus passes.
``compact_dfreq`` folds the delta log when it grows long (many small
epochs), same epoch-compaction rationale as the ANN index maintenance;
``compact_index`` adds the bucket-preserving postings rewrite (one file
per bucket). Serving knobs: ``collect_terms=False`` swaps the pushed
term predicate for a semi-join when the query batch's vocabulary is too
large to collect; ``as_of_completed=True`` pins reads to the last
completed epoch's watermark (snapshot-consistent lookups while a stream
appends); ``hybrid_index_search`` fuses this index with the persisted
IVF index by reciprocal rank — the whole serving path off indexes, the
corpus never re-read.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from basic_data_pipeline_spark.caching import tracked_persist
from basic_data_pipeline_spark.streaming import swapstore as _swapstore
from basic_data_pipeline_spark.operators import retrieval
from basic_data_pipeline_spark.sources import tables

DEFAULT_INDEX_BUCKETS = 16


def _p(index_path: str, name: str) -> str:
    return os.path.join(index_path, name)


def _table_names(index_path: str) -> tuple[str, str]:
    h = hashlib.md5(os.path.abspath(index_path).encode()).hexdigest()[:12]
    return f"retr_idx_{h}_postings", f"retr_idx_{h}_dfreq"


def _meta_rw(index_path: str, meta: dict | None = None) -> dict:
    path = _p(index_path, "_meta.json")
    if meta is not None:
        os.makedirs(index_path, exist_ok=True)
        with open(path, "w") as f:
            json.dump(meta, f)
        return meta
    with open(path) as f:
        return json.load(f)


def _registered(
    spark: SparkSession,
    index_path: str,
    sub: str,
    table: str,
    n_buckets: int,
) -> DataFrame:
    """Re-register one bucketed index table from its on-disk files if
    this session has never seen it (schema from the parquet — ids keep
    their corpus-native type, same rationale as the gram index)."""
    if not spark.catalog.tableExists(table):
        schema = spark.read.parquet(_p(index_path, sub)).schema
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        spark.sql(
            f"CREATE TABLE {table} ({cols}) USING PARQUET "
            "CLUSTERED BY (term) SORTED BY (term) "
            f"INTO {n_buckets} BUCKETS LOCATION '{_p(index_path, sub)}'"
        )
    return spark.table(table)


def _postings_of(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(term, neighbor_id, dl, tf) for ``docs`` — the same one-explode +
    one-groupBy build as retrieval.bm25_topk's corpus side (dl rides
    through the groupBy key: functional on the doc id)."""
    toks = docs.select(
        F.col(id_col).alias("neighbor_id"),
        F.size(retrieval._clean_tokens(F.col(text_col))).alias("dl"),
        F.explode(retrieval._clean_tokens(F.col(text_col))).alias("term"),
    )
    return toks.groupBy("neighbor_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )


def _stats_row(
    docs: DataFrame, text_col: str, wm_col
) -> DataFrame:
    """One additive (n_docs, sum_dl, _wm) row. Computed from the DOC
    side, not the postings: token-less documents count toward N exactly
    as they do in the one-shot operator."""
    return (
        docs.select(
            F.size(retrieval._clean_tokens(F.col(text_col))).alias("dl")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sum_dl"),
        )
        .select("n_docs", "sum_dl", wm_col.alias("_wm"))
    )


def _write_increment(
    spark: SparkSession,
    docs: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str,
    n_buckets: int,
    mode: str,
) -> tuple[DataFrame, object]:
    """Postings + dfreq delta + stats row for ``docs``, written in that
    order (all three are watermark-cut on rebuild, so partial-write
    order doesn't matter). Returns (persisted postings, watermark)."""
    wm = docs.agg(F.max(id_col)).first()[0]
    # _wm always carries the id column's OWN type: a base corpus whose
    # max id happens to fit an int32 must not freeze the column as INT
    # and overflow when a later batch's BIGINT watermark appends (found
    # by the 16x probe, whose increment ids sit above 10^10)
    wm_col = F.lit(wm).cast(docs.schema[id_col].dataType)
    postings_t, dfreq_t = _table_names(index_path)
    if mode == "append":
        # a fresh session appending to an on-disk index: re-register the
        # catalog entries first (metadata-only) so saveAsTable appends
        # against the recorded bucket spec instead of re-deriving it
        _registered(spark, index_path, "postings", postings_t, n_buckets)
        _registered(spark, index_path, "dfreq", dfreq_t, n_buckets)
    postings = tracked_persist(_postings_of(docs, id_col, text_col))
    tables.write_bucketed(
        postings.select("term", "neighbor_id", "dl", "tf"),
        postings_t,
        ["term"],
        n_buckets,
        sort_cols=["term"],
        mode=mode,
        path=_p(index_path, "postings"),
    )
    tables.write_bucketed(
        postings.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .select("term", "df", wm_col.alias("_wm")),
        dfreq_t,
        ["term"],
        n_buckets,
        sort_cols=["term"],
        mode=mode,
        path=_p(index_path, "dfreq"),
    )
    _stats_row(docs, text_col, wm_col).write.mode(
        "overwrite" if mode == "overwrite" else "append"
    ).parquet(_p(index_path, "stats"))
    return postings, wm


@_swapstore.leased("index_path", owner="batch:incremental_retrieval.build_retrieval_index")
def build_retrieval_index(
    spark: SparkSession,
    docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_INDEX_BUCKETS,
) -> dict:
    """Index the base corpus. Returns a summary dict {n_docs, sum_dl,
    n_postings}."""
    postings, wm = _write_increment(
        spark, docs, index_path, id_col, text_col, n_buckets, "overwrite"
    )
    n_postings = postings.count()
    row = spark.read.parquet(_p(index_path, "stats")).first()
    _meta_rw(
        index_path,
        {"id_col": id_col, "text_col": text_col, "n_buckets": n_buckets,
         # base-corpus id watermark for streaming/rebuild.py
         "max_id": wm},
    )
    return {
        "n_docs": row["n_docs"],
        "sum_dl": row["sum_dl"],
        "n_postings": n_postings,
    }


@_swapstore.leased("index_path", owner="batch:incremental_retrieval.incremental_retrieval_append")
def incremental_retrieval_append(
    spark: SparkSession,
    batch: DataFrame,
    index_path: str,
) -> DataFrame:
    """Fold ``batch`` into the index (increment-only shuffle — the
    index tables are appended, never read). Returns the batch's indexing
    receipt (neighbor_id, dl, n_terms): one row per batch document,
    computed from the batch alone (a zero-shuffle projection) — the
    natural per-epoch output for the streaming twin."""
    meta = _meta_rw(index_path)
    _write_increment(
        spark, batch, index_path, meta["id_col"], meta["text_col"],
        meta["n_buckets"], "append",
    )
    toks = retrieval._clean_tokens(F.col(meta["text_col"]))
    return batch.select(
        F.col(meta["id_col"]).alias("neighbor_id"),
        F.size(toks).alias("dl"),
        F.size(F.array_distinct(toks)).alias("n_terms"),
    )


def index_stats(spark: SparkSession, index_path: str) -> dict:
    """Current global (n_docs, sum_dl) — the exact integer sums of the
    additive stats rows."""
    row = (
        spark.read.parquet(_p(index_path, "stats"))
        .agg(F.sum("n_docs").alias("n_docs"), F.sum("sum_dl").alias("sum_dl"))
        .first()
    )
    return {"n_docs": row["n_docs"], "sum_dl": row["sum_dl"]}


def search_retrieval_index(
    spark: SparkSession,
    queries: DataFrame,
    index_path: str,
    k: int,
    *,
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float | None = None,
    exclude_self: bool = False,
    collect_terms: bool = True,
    as_of_completed: bool = False,
) -> DataFrame:
    """(query_id, neighbor_id, rank, score): top-k by BM25 against the
    persisted index — EXACTLY what bm25_topk(corpus-so-far, queries)
    would return, at index-lookup cost.

    ``collect_terms=True`` (default — the bounded-query-batch regime
    every retrieval API here assumes): the batch's distinct term set is
    collected to the driver and pushed into the postings/dfreq scans as
    a term predicate, so the big table is read through its sorted-bucket
    layout with row-group pruning instead of scanned — the columnar
    "seek the postings list". For query batches too large to
    materialize a term list on the driver (corpus-sized query-by-
    document sweeps), ``collect_terms=False`` prunes with a term
    semi-join against the bucketed postings instead — no driver
    collect, no pushed predicate (the index scans once), and only the
    QUERY side shuffles to the bucket layout. Results are identical.
    df and (N, Σdl) are exact sums of the pruned delta log and the
    stats rows. ``max_df_frac`` applies against the CURRENT doc count —
    the same cut the one-shot operator makes over the full corpus.

    ``as_of_completed=True`` pins the read to the last COMPLETED
    epoch's id watermark (the same cutoff the crash rebuild uses):
    postings above it and dfreq/stats rows tagged above it are filtered
    out, so a search that overlaps an in-flight (or crashed) append
    sees a CONSISTENT snapshot — exactly the index as of the last
    completed epoch — instead of partial postings whose df/stats
    haven't landed. The serving-path read-isolation knob for a live
    streaming index; costs three codegen filters, no extra pass."""
    meta = _meta_rw(index_path)
    postings_t, dfreq_t = _table_names(index_path)
    idx = _registered(
        spark, index_path, "postings", postings_t, meta["n_buckets"]
    )
    dlog = _registered(spark, index_path, "dfreq", dfreq_t, meta["n_buckets"])
    wm_cut = None
    if as_of_completed:
        ledger_path = _p(index_path, "_stream_ledger.json")
        wm_cut = meta.get("max_id")
        if os.path.exists(ledger_path):
            with open(ledger_path) as f:
                for state in json.load(f).values():
                    if isinstance(state, dict) and state.get("max_id") is not None:
                        m = state["max_id"]
                        wm_cut = m if wm_cut is None else max(wm_cut, m)
        if wm_cut is None:
            raise ValueError(
                "as_of_completed needs an id watermark: the index "
                "predates watermark recording and no stream epoch has "
                "completed"
            )
        idx = idx.filter(F.col("neighbor_id") <= F.lit(wm_cut))
        dlog = dlog.filter(F.col("_wm") <= F.lit(wm_cut))

    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(
            F.array_distinct(retrieval._clean_tokens(F.col(query_text_col)))
        ).alias("term"),
    )
    if collect_terms:
        terms = sorted(
            r["term"] for r in qterms.select("term").distinct().collect()
        )
        postings = idx.filter(F.col("term").isin(terms))
        dfreq = dlog.filter(F.col("term").isin(terms))
    else:
        tset = qterms.select("term").distinct()
        postings = idx.join(tset, "term", "left_semi")
        dfreq = dlog.join(tset, "term", "left_semi")
    dfreq = dfreq.groupBy("term").agg(F.sum("df").alias("df"))
    stats_src = spark.read.parquet(_p(index_path, "stats"))
    if wm_cut is not None:
        stats_src = stats_src.filter(F.col("_wm") <= F.lit(wm_cut))
    stats = stats_src.agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("sum_dl").alias("sum_dl"),
    )
    if max_df_frac is not None:
        dfreq = (
            dfreq.join(F.broadcast(stats), how="cross")
            .filter(F.col("df") <= F.col("n_docs") * F.lit(max_df_frac))
            .select("term", "df")
        )

    contrib = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats), how="cross")
        .select(
            "query_id",
            "neighbor_id",
            retrieval.bm25_contribution(k1, b).alias("c"),
        )
    )
    if exclude_self:
        contrib = contrib.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = contrib.groupBy("query_id", "neighbor_id").agg(
        F.sum("c").alias("score")
    )
    return retrieval.ranked_topk(scored, k)


def hybrid_index_search(
    spark: SparkSession,
    queries: DataFrame,
    index_path: str,
    ann_index_path: str,
    dim: int,
    k: int,
    *,
    fetch_k: int | None = None,
    nprobe: int = 2,
    k_rrf: int = 60,
    max_df_frac: float | None = None,
    exclude_self: bool = False,
) -> DataFrame:
    """Hybrid (sparse + dense) retrieval ENTIRELY from persisted
    indexes: BM25 top-``fetch_k`` against the inverted index RRF-fused
    (retrieval.rrf_fuse) with cosine top-``fetch_k`` against the IVF
    index (similarity.ivf_index_search), re-ranked to the final ``k``.
    ``queries`` carries (query_id, query_text, embedding). The corpus is
    touched by NEITHER side — text goes through the term-bucketed
    postings, vectors through the cell-partitioned inverted lists — so
    a hybrid lookup costs two index probes + one union-and-aggregate
    fusion, the serving-path shape a 100 TB corpus demands.

    ``fetch_k`` (default 3k) controls how deep each list goes before
    fusion — RRF needs deeper inputs than the final cut because a
    neighbor strong in one modality may sit below k in the other. Note
    the IVF side always drops neighbor_id == query_id (its
    query-by-document contract); pass ``exclude_self=True`` to match on
    the BM25 side when the namespaces overlap."""
    from basic_data_pipeline_spark.operators import similarity

    fetch = fetch_k or max(3 * k, 10)
    sparse = search_retrieval_index(
        spark,
        queries.select("query_id", "query_text"),
        index_path,
        fetch,
        max_df_frac=max_df_frac,
        exclude_self=exclude_self,
    )
    dense = similarity.ivf_index_search(
        queries.select(F.col("query_id").alias("vec_id"), "embedding"),
        ann_index_path,
        dim,
        fetch,
        nprobe=nprobe,
    )
    return retrieval.rrf_fuse(
        {
            "bm25": sparse.select("query_id", "neighbor_id", "rank"),
            "cosine": dense.select("query_id", "neighbor_id", "rank"),
        },
        k,
        k_rrf=k_rrf,
    )


@_swapstore.leased("index_path", owner="batch:incremental_retrieval.compact_dfreq")
def compact_dfreq(spark: SparkSession, index_path: str) -> dict:
    """Fold the df delta log to one row per term (keeping each term's
    max watermark, so rebuild semantics survive compaction: folded rows
    cover completed appends only, so every future rebuild cutoff sits at
    or above their watermark). Run BETWEEN appends when many small
    epochs have accumulated; searches stay correct without it — this
    trades a one-off bucket shuffle for shorter delta scans. Refuses to
    run while a guarded stream's intent marker is pending (folding a
    crashed epoch's partial rows would make them unrecoverable — run
    streaming.rebuild.rebuild_retrieval_index first). Returns
    {rows_before, rows_after}."""
    from basic_data_pipeline_spark.operators import maintenance

    maintenance.assert_clean_stream_ledger(index_path)
    meta = _meta_rw(index_path)
    _, dfreq_t = _table_names(index_path)
    src = _p(index_path, "dfreq")
    before = spark.read.parquet(src).count()
    rep = maintenance.compact_bucketed(
        spark, src, dfreq_t, ["term"], meta["n_buckets"],
        sort_cols=["term"],
        fold=lambda df: df.groupBy("term")
        .agg(F.sum("df").alias("df"), F.max("_wm").alias("_wm"))
        .select("term", "df", "_wm"),
    )
    return {"rows_before": before, "rows_after": rep["rows"]}


@_swapstore.leased("index_path", owner="batch:incremental_retrieval.compact_index")
def compact_index(spark: SparkSession, index_path: str) -> dict:
    """Full index maintenance: fold the df delta log (compact_dfreq)
    AND rewrite the postings table back to one file per bucket — every
    epoch append lays down n_buckets more postings files, so a
    long-lived stream accretes files linearly. Same intent guard as
    every compaction here."""
    from basic_data_pipeline_spark.operators import maintenance

    maintenance.assert_clean_stream_ledger(index_path)
    meta = _meta_rw(index_path)
    postings_t, _ = _table_names(index_path)
    return {
        "postings": maintenance.compact_bucketed(
            spark, _p(index_path, "postings"), postings_t,
            ["term"], meta["n_buckets"], sort_cols=["term"],
        ),
        "dfreq": compact_dfreq(spark, index_path),
    }
