"""Domain-level corpus curation: per-domain quota capping, domain
stats, and blocklist/allowlist filtering (SURVEY.md §2.11).

Web-scale training corpora are curated per *domain* before any
per-document filter runs: RefinedWeb and CCNet cap how many documents a
single domain may contribute (a handful of mirror-heavy domains
otherwise dominate the corpus), and every production pipeline carries a
domain blocklist. The reference has no notion of domains (its only
grouping is the CDC table name, /root/reference/consumer_to_file.py:
135-160); here the `documents.source` column plays the domain role.

Scale design:

- ``domain_cap`` keeps a deterministic pseudo-random sample of at most
  ``cap`` documents per domain. The rank key is a hash of the document
  id (xxhash64 by default), NOT arrival order, so the kept set is a
  uniform sample of the domain and is stable under any partitioning or
  input order. Ranking is a ``row_number`` window — one shuffle on the
  domain key. A hot domain (the exact population this operator exists
  to tame) would make that window a single straggler task, so the
  window is SALTED two-phase: pass 1 ranks within (domain, salt) and
  keeps at most ``cap`` rows per salt bucket — the hot domain's sort
  fans out across ``salt_buckets`` tasks — and pass 2 ranks the
  ≤ cap·salt_buckets survivors per domain, a frame bounded by
  #domains·cap·salt_buckets regardless of corpus size. Both passes rank
  a narrow (domain, id, rank-key) projection; the full rows rejoin by a
  semi-join on id so wide document rows are never shuffled twice.
- ``domain_stats`` is one map-side-partial ``groupBy`` producing one
  row per domain; every aggregate is an exact integer sum or count (the
  one ratio is a single integer/integer division, bit-reproducible).
- ``domain_filter`` is a broadcast semi/anti join against the
  domain-list frame — blocklists are small by construction, so the
  corpus side never shuffles.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def domain_cap(
    df: DataFrame,
    domain_col: str,
    cap: int,
    id_col: str = "doc_id",
    rank_key: Optional[Column] = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """At most ``cap`` rows per ``domain_col`` value, chosen as the
    ``cap`` smallest ``rank_key`` values (default ``xxhash64(id)`` — a
    deterministic uniform sample). Exact, order-insensitive, and
    partitioning-invariant; ties on the rank key break by id, so the
    kept set is unique whenever ids are.

    ``salt_buckets`` controls the skew fan-out of the first-pass window
    (see module docstring); any value >= 1 returns the identical kept
    set because pass 1 only discards rows that at least ``cap`` rows of
    the SAME domain and bucket already beat.
    """
    if cap < 0:
        raise ValueError(f"cap must be >= 0, got {cap}")
    if salt_buckets < 1:
        raise ValueError(f"salt_buckets must be >= 1, got {salt_buckets}")
    if cap == 0:
        return df.limit(0)
    key = rank_key if rank_key is not None else F.xxhash64(F.col(id_col))
    narrow = df.select(
        F.col(domain_col).alias("_dom"),
        F.col(id_col).alias("_id"),
        key.alias("_rk"),
    )
    if salt_buckets > 1:
        salted = Window.partitionBy(
            "_dom", F.pmod(F.xxhash64(F.col("_id"), F.lit(1)), salt_buckets)
        ).orderBy("_rk", "_id")
        narrow = narrow.withColumn(
            "_srn", F.row_number().over(salted)
        ).filter(F.col("_srn") <= cap).drop("_srn")
    final = Window.partitionBy("_dom").orderBy("_rk", "_id")
    kept = (
        narrow.withColumn("_rn", F.row_number().over(final))
        .filter(F.col("_rn") <= cap)
        .select(F.col("_id").alias(id_col))
    )
    return df.join(kept, id_col, "left_semi")


def domain_cap_ranked(
    df: DataFrame,
    domain_col: str,
    cap: int,
    id_col: str = "doc_id",
    rank_key: Optional[Column] = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """(domain, id, rank): the kept set of ``domain_cap`` with its
    within-domain rank (1-based, rank order = kept-sample order) —
    the audit view a curation report wants, without re-deriving the
    window. Same exactness and salting contract as ``domain_cap``."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if salt_buckets < 1:
        raise ValueError(f"salt_buckets must be >= 1, got {salt_buckets}")
    key = rank_key if rank_key is not None else F.xxhash64(F.col(id_col))
    narrow = df.select(
        F.col(domain_col).alias("domain"),
        F.col(id_col).alias(id_col),
        key.alias("_rk"),
    )
    if salt_buckets > 1:
        salted = Window.partitionBy(
            "domain",
            F.pmod(F.xxhash64(F.col(id_col), F.lit(1)), salt_buckets),
        ).orderBy("_rk", id_col)
        narrow = narrow.withColumn(
            "_srn", F.row_number().over(salted)
        ).filter(F.col("_srn") <= cap).drop("_srn")
    final = Window.partitionBy("domain").orderBy("_rk", id_col)
    return (
        narrow.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= cap)
        .select("domain", id_col, "rank")
    )


def domain_stats(
    df: DataFrame,
    domain_col: str,
    size_col: str = "n_chars",
    lang_col: str = "lang",
) -> DataFrame:
    """One row per domain: document count, exact total size, exact
    mean size (integer-sum / count — one division, bit-reproducible),
    and distinct language count. The curation dashboard every
    web-corpus pipeline starts from; one map-side-partial groupBy."""
    return df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_docs"),
        F.sum(size_col).alias("total_size"),
        (
            F.sum(size_col).cast("double") / F.count(size_col)
        ).alias("mean_size"),
        # size(collect_set) not countDistinct: a DISTINCT aggregate next
        # to the plain ones triggers the expand rewrite and shuttles the
        # docs scan twice through the aggregate; the language set is
        # tiny-bounded per domain, so the set aggregate is the cheap
        # exact form (both exclude nulls — identical semantics)
        F.size(F.collect_set(lang_col)).alias("n_langs"),
    )


def domain_filter(
    df: DataFrame,
    domain_col: str,
    blocklist: Optional[DataFrame] = None,
    allowlist: Optional[DataFrame] = None,
    list_col: str = "domain",
) -> DataFrame:
    """Drop rows whose domain is on ``blocklist`` and/or keep only rows
    whose domain is on ``allowlist`` (each a 1-column frame of domain
    values). Both joins broadcast the list side — domain lists are
    small by construction, so the corpus side never shuffles."""
    if blocklist is None and allowlist is None:
        raise ValueError("pass blocklist and/or allowlist")
    out = df
    if allowlist is not None:
        out = out.join(
            F.broadcast(
                allowlist.select(F.col(list_col).alias(domain_col)).distinct()
            ),
            domain_col,
            "left_semi",
        )
    if blocklist is not None:
        out = out.join(
            F.broadcast(
                blocklist.select(F.col(list_col).alias(domain_col)).distinct()
            ),
            domain_col,
            "left_anti",
        )
    return out


def domains_from_values(
    spark, values: Sequence[str], list_col: str = "domain"
) -> DataFrame:
    """Literal domain list -> 1-column frame (blocklist/allowlist
    input for ``domain_filter``)."""
    return spark.createDataFrame(
        [(v,) for v in values], f"{list_col} string"
    )


def _norm_phrases(phrases: DataFrame, phrase_col: str) -> DataFrame:
    """(phrase, n): whitespace-normalized lower-cased phrases with their
    token counts, deduplicated. The normalized form is the match key AND
    the reported phrase."""
    w = F.filter(
        F.split(F.lower(F.col(phrase_col)), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    return (
        phrases.select(
            F.array_join(w, " ").alias("phrase"),
            F.size(w).alias("n"),
        )
        .filter(F.col("n") > 0)
        .distinct()
    )


def phrase_blocklist_hits(
    docs: DataFrame,
    phrases: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    phrase_col: str = "phrase",
    use_bloom: bool = False,
) -> DataFrame:
    """(id, phrase, n_hits): token-boundary occurrence counts of every
    blocklist phrase in every document — the C4/CCNet banned-phrase
    content gate, multi-word aware (a "bad word" list only needs n=1; a
    phrase list needs windows). Only (doc, phrase) pairs with ≥1 hit
    appear. ``phrase`` in the output is the whitespace-normalized,
    lower-cased form.

    Plan shape: one pass per DISTINCT phrase length n — position
    n-grams of the documents' token arrays (multiset, so counts are
    true occurrence counts) joined against the broadcast length-n
    phrase slice, then one (id, phrase) count. Phrase lists are
    control-plane small (the distinct lengths are collected, typically
    1-8), so the corpus side never shuffles before the candidate-only
    count. ``use_bloom`` additionally prefilters each gram stream with
    a Bloom filter over the WHOLE normalized phrase set
    (packing.bloom_build — codegen bit probes at the scan) before the
    join: the right shape when the phrase list is large enough that
    probing the broadcast hash map per gram dominates; results are
    identical (the join verifies every candidate)."""
    from basic_data_pipeline_spark.operators import packing

    norm = _norm_phrases(phrases, phrase_col)
    lengths = sorted(r["n"] for r in norm.select("n").distinct().collect())
    if not lengths:
        raise ValueError("phrase blocklist is empty after normalization")
    bloom = None
    if use_bloom:
        bloom = packing.bloom_build(norm, "phrase")

    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"),
            lambda t: F.length(t) > 0,
        ).alias("w"),
    )
    out = None
    for n in lengths:
        grams = toks.filter(F.size("w") >= n).select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - F.lit(n)),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("w"), i + F.lit(1), n)
                    ),
                )
            ).alias("phrase"),
        )
        if bloom is not None:
            grams = grams.filter(
                packing.bloom_might_contain(F.col("phrase"), *bloom)
            )
        part = grams.join(
            F.broadcast(norm.filter(F.col("n") == n).select("phrase")),
            "phrase",
        ).groupBy(id_col, "phrase").agg(F.count(F.lit(1)).alias("n_hits"))
        out = part if out is None else out.unionByName(part)
    return out.select(id_col, "phrase", "n_hits")


def phrase_blocklist_filter(
    docs: DataFrame,
    phrases: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    phrase_col: str = "phrase",
    use_bloom: bool = False,
) -> DataFrame:
    """Documents containing NO blocklist phrase — the filter face of
    ``phrase_blocklist_hits`` (one anti-join on the hit ids)."""
    hits = phrase_blocklist_hits(
        docs, phrases, id_col, text_col, phrase_col, use_bloom
    )
    return docs.join(
        hits.select(id_col).distinct(), id_col, "left_anti"
    )
