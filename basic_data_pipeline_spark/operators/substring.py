"""Exact substring dedup: remove repeated ≥k-token spans across the
whole corpus, keeping the globally first occurrence (the suffix-array
dedup of Lee et al., "Deduplicating Training Data Makes Language Models
Better", 2022 — here re-expressed as hash-join relational algebra
instead of a monolithic suffix array, which does not distribute).

Why a third dedup granularity: MinHash (dedup.py) is DOCUMENT-level and
line dedup (dedup.py line_dedup_corpus) is LINE-granular — neither
catches a 200-token span pasted mid-document into otherwise-distinct
pages. This operator works at token-window granularity: ANY span of at
least ``k`` tokens that occurs more than once in the corpus (across or
within documents) is removed from every position except the globally
first (lexicographic (doc_id, token_pos)) occurrence.

Relational formulation (all linear, no suffix array):

1. tokenize each document (whitespace split — the package's token
   convention, text.py n_tokens) and fingerprint every k-token window
   with one 64-bit hash: a zero-shuffle projection
   (transform+slice+xxhash64, whole-stage codegen);
2. posexplode to (doc, pos, gram) occurrences — corpus-token-count
   rows, the same cost envelope as the line/shingle operators;
3. per distinct gram, ONE aggregation computes the occurrence count and
   the first occurrence (min struct) — map-side partial aggregation
   absorbs hot grams (a million-fold repeated span contributes one
   partial row per task), then a single hash join marks every non-first
   occurrence of a repeated gram; AQE's skew-join split handles a
   pathological gram on the probe side;
4. per document, adjacent/overlapping duplicate windows merge into
   MAXIMAL spans with one lag window (gap > k starts a new span — the
   covered-token union is exactly the per-window union, see
   duplicate_spans docstring);
5. spans explode to covered token positions; one anti-join drops them;
   reassembly reuses the line-dedup rebuild shape (order-preserving
   groupBy per document, group size bounded by document length).

Shuffle census at 100 TB: gram stats groupBy + stats join (keyed on the
64-bit gram), span window + covered anti-join + rebuild (keyed on
doc_id) — five linear shuffles, two key families, no quadratic
candidate space anywhere (the "index" side is one row per DISTINCT
gram, like the line-dedup stats frame). Matching is by 64-bit hash, the
same accepted-collision contract as the MinHash/SimHash family.

Reference parity: the reference repo has no sub-document dedup at all
(its pipeline is row-forwarding, consumer_to_file.py); this implements
the north-star LLM-corpus surface. Tests pin the whole pipeline against
a brute-force serial Python reference implementing the same policy
(tests/test_substring.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Non-printing separator between tokens inside a hashed window, so token
# boundaries can't alias ("ab c" vs "a bc").
_SEP = ""


def gram_occurrences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """(id, pos, gram): one row per k-token window start position, with
    ``gram`` the xxhash64 fingerprint of tokens[pos .. pos+k-1]
    (0-based). Documents shorter than ``k`` tokens contribute no rows.
    Zero shuffle — tokenize, window-hash and posexplode are one codegen
    projection."""
    if k < 2:
        raise ValueError("need k >= 2 (k=1 is plain token dedup)")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return (
        docs.select(F.col(id_col), toks.alias("_tk"))
        .filter(F.size("_tk") >= k)
        .select(
            F.col(id_col),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("_tk") - k),
                    lambda i: F.xxhash64(
                        F.concat_ws(_SEP, F.slice(F.col("_tk"), i + 1, k))
                    ),
                )
            ).alias("pos", "gram"),
        )
    )


def duplicate_positions(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """(id, pos): every k-token window that repeats somewhere in the
    corpus, EXCLUDING each repeated gram's globally first occurrence
    (min (doc_id, pos)). One groupBy on the gram hash + one join back —
    the stats side is one narrow row per DISTINCT repeated gram."""
    occ = gram_occurrences(docs, id_col, text_col, k)
    stats = (
        occ.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first"),
        )
        .filter(F.col("_n") > 1)
        .select("gram", "_first")
    )
    return (
        occ.join(stats, "gram")
        .filter(F.struct(F.col(id_col), F.col("pos")) != F.col("_first"))
        .select(id_col, "pos")
    )


def merge_window_spans(
    dup: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """(id, span_start, span_end) from a (id, pos) frame of duplicate
    window START positions: MAXIMAL merged token spans (inclusive,
    0-based) per document.

    A duplicate window at ``pos`` covers tokens [pos, pos+k-1]. Two
    windows p < q merge exactly when q - p <= k (their coverages overlap
    when q <= p+k-1, touch when q = p+k); the merged span covers the
    UNION of the window coverages with no extra tokens, so exploding the
    merged spans reproduces the per-window covered set bit-for-bit. One
    doc-keyed lag window + one groupBy, both on the doc_id partitioning.
    """
    w = Window.partitionBy(id_col).orderBy("pos")
    return (
        dup.withColumn(
            "_new",
            (
                F.col("pos") - F.lag("pos").over(w) > F.lit(k)
            ).cast("int"),
        )
        .withColumn(
            "_span",
            F.sum(F.coalesce(F.col("_new"), F.lit(0))).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy(id_col, "_span")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        )
        .select(id_col, "span_start", "span_end")
    )


def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """(id, span_start, span_end): MAXIMAL token spans covered by
    duplicated windows, merged per document (see merge_window_spans)."""
    return merge_window_spans(
        duplicate_positions(docs, id_col, text_col, k), k, id_col
    )


def remove_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rebuild (id, text, n_tokens_kept) with every token covered by
    ``spans`` (inclusive 0-based token ranges) removed; token order
    preserved, whitespace normalized to single spaces. Documents whose
    every token was removed do not appear; documents with no spans pass
    through (whitespace-normalized). Spans explode to covered positions
    (linear in removed volume) → one anti-join → per-doc bounded
    rebuild."""
    toks = (
        docs.select(
            F.col(id_col),
            F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
                "pos", "_tok"
            ),
        )
    )
    covered = (
        spans.select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("span_start"), F.col("span_end"))
            ).alias("pos"),
        )
        .distinct()
    )
    kept = toks.join(covered, [id_col, "pos"], "left_anti")
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("_tok")))
            ).alias("_ts"),
            F.count(F.lit(1)).alias("n_tokens_kept"),
        )
        .select(
            F.col(id_col),
            F.concat_ws(
                " ", F.transform(F.col("_ts"), lambda s: s["_tok"])
            ).alias(text_col),
            "n_tokens_kept",
        )
    )


def substring_dedup_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """One-call corpus rewrite: every token covered by a repeated
    ≥k-token span is removed except at the span content's globally first
    occurrence; returns (id, text, n_tokens_kept) with token order
    preserved and whitespace normalized to single spaces (tokenization
    is lossy for whitespace, exactly like the reassembled line dedup).
    Documents whose every token was removed do not appear; documents
    with no duplicated spans pass through (whitespace-normalized)."""
    return remove_spans(
        docs, duplicate_spans(docs, id_col, text_col, k), id_col, text_col
    )
