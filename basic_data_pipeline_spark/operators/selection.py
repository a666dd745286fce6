"""DSIR-style data selection via importance resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling" — public
paper; re-expressed here as DataFrame aggregations, no port).

The recipe: featurize every document as a bag of HASHED n-grams (unigrams
+ bigrams folded into ``n_buckets`` counters — the feature space is fixed
and tiny no matter how large the vocabulary), fit two smoothed categorical
distributions over the buckets — ``p`` on a small TARGET corpus (the data
you want more of) and ``q`` on the RAW pool being selected from — then
weight every raw document by its log importance ratio

    log w(x) = sum_b  c_b(x) * ( log p_b - log q_b )

and resample without replacement with the Gumbel top-k trick: add a
Gumbel(0,1) noise term to each document's log-weight and keep the k
largest keys.  This draws k documents ~ w(x) without replacement in ONE
pass — no sequential sampling loop.

The reference system has no data-selection surface at all (its pipeline
is Kafka -> file, /root/reference/consumer_to_file.py); this operator is
part of the north-star LLM-training-data surface, next to the dedup /
quality / mixing family.

Scale design (the 100 TB contract):

- The bucket tables are O(n_buckets) rows (default 4096) regardless of
  corpus size: the target/raw fits are each ONE map-side-partial
  ``groupBy(bucket)`` over the exploded grams, and the resulting
  log-ratio table always broadcasts.
- Per-document weights are two linear shuffles keyed by (id, bucket) and
  id — the same key family every other per-document aggregation here
  uses, positioned by ``spread`` so explode-heavy stages run at cluster
  parallelism.
- Selection has two paths: exact ``sort().limit(k)`` for driver-sized k
  (per-partition partial top-k + a k-row driver merge,
  TakeOrderedAndProject — not a full sort shuffle), and the
  quantile-threshold path (``importance_resample_threshold``) for
  corpus-scale k, which sketches the key distribution and filters —
  zero driver materialization.
- Everything is deterministic and engine-portable: buckets come from an
  md5 prefix (``conv(substr(md5(gram),1,8),16,10) % n_buckets`` — DuckDB:
  ``('0x' || substr(md5(gram),1,8))::BIGINT``), log-ratios are rounded at
  6 places and accumulated as DECIMAL so the per-document sum is exact
  under ANY partitioning (the classifier.py convention), and the Gumbel
  noise is derived from md5(salt || id) instead of an RNG, so reruns and
  the DuckDB oracle reproduce the identical sample.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from basic_data_pipeline_spark.caching import tracked_persist
from basic_data_pipeline_spark.partitioning import spread

#: Decimal type for exact log-ratio accumulation: the per-bucket
#: log-ratio is rounded to 6 places, so c_b * lam_b needs 6 fractional
#: digits and sums of ~1e6-gram documents stay far inside 38 digits.
_DEC = "decimal(38,6)"

#: Above this k, exact top-k (TakeOrderedAndProject: k rows at the
#: driver) stops being reasonable — callers that scale k with the corpus
#: should switch to ``importance_resample_threshold`` (the pipeline
#: stage does so automatically).
EXACT_K_CEILING = 1_000_000


def _bucket(gram: Column, n_buckets: int) -> Column:
    """Engine-portable hash bucket: value of the first 8 md5 hex chars
    mod ``n_buckets`` (DuckDB twin: ``('0x'||substr(md5(g),1,8))::BIGINT``)."""
    return F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long") % n_buckets


def hashed_ngram_counts(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
    ns: Sequence[int] = (1, 2),
) -> DataFrame:
    """(id, bucket, cnt) — hashed n-gram bag-of-words features.

    Tokens are the lower-cased whitespace split (the word_shingles
    convention); each n in ``ns`` contributes every n-gram joined by a
    single space, hashed into ``n_buckets`` md5 buckets. The explode runs
    at cluster parallelism (``spread``) and the count is one
    map-side-partial groupBy on (id, bucket) — the shuffle carries at
    most min(#grams, #docs * n_buckets) rows."""
    toks = spread(docs, id_col).select(
        F.col(id_col), F.split(F.lower(F.col(text_col)), r"\s+").alias("w")
    )
    gram_arrays = [
        F.expr(
            f"transform(sequence(0, greatest(size(w) - {n}, 0)),"
            f" i -> concat_ws(' ', slice(w, i + 1, {n})))"
        )
        for n in ns
    ]
    grams = toks.select(
        F.col(id_col), F.explode(F.concat(*gram_arrays)).alias("gram")
    )
    return (
        grams.select(F.col(id_col), _bucket(F.col("gram"), n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def importance_log_ratios(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """(bucket, lam) — the per-bucket log importance ratio
    ``lam_b = round(log p_b - log q_b, 6)`` under add-``alpha`` smoothing

        p_b = (t_b + alpha) / (T + alpha * n_buckets)

    (and likewise q from the raw counts). This is the DSIR "model": an
    EXACTLY ``n_buckets``-row frame (one row per bucket id 0..B-1, the
    full closed hash domain) that persists like a centroid table and
    always broadcasts. ``lam`` is DECIMAL(38,6) so downstream document
    sums are exact and partitioning-invariant. Covering the whole domain
    matters once the model is FROZEN and reused: a bucket unseen during
    the fit still has a well-defined smoothed ratio
    ``ln((R + alpha*B) / (T + alpha*B))``, and a novel-vocabulary
    document scored later must receive it — not a silent 0 (which would
    reject exactly the out-of-distribution documents the smoothing
    exists to price)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 (smoothing), got {alpha}")
    t = target_counts.groupBy("bucket").agg(F.sum("cnt").alias("t_b"))
    r = raw_counts.groupBy("bucket").agg(F.sum("cnt").alias("r_b"))
    # Totals are single-row frames; cross-join (broadcast, 1 row) beats
    # collecting through the driver and keeps the whole fit one plan.
    t_tot = t.agg(F.sum("t_b").alias("t_total"))
    r_tot = r.agg(F.sum("r_b").alias("r_total"))
    domain = (
        target_counts.sparkSession.range(n_buckets)
        .select(F.col("id").alias("bucket"))
    )
    joined = (
        domain.join(t, "bucket", "left")
        .join(r, "bucket", "left")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "bucket",
            F.coalesce(F.col("t_b"), F.lit(0)).alias("t_b"),
            F.coalesce(F.col("r_b"), F.lit(0)).alias("r_b"),
            F.coalesce(F.col("t_total"), F.lit(0)).alias("t_total"),
            F.coalesce(F.col("r_total"), F.lit(0)).alias("r_total"),
        )
    )
    log_p = F.log((F.col("t_b") + alpha) / (F.col("t_total") + alpha * n_buckets))
    log_q = F.log((F.col("r_b") + alpha) / (F.col("r_total") + alpha * n_buckets))
    return joined.select(
        "bucket", F.round(log_p - log_q, 6).cast(_DEC).alias("lam")
    )


def importance_log_weights(
    doc_counts: DataFrame, log_ratios: DataFrame, id_col: str
) -> DataFrame:
    """(id, n_grams, log_w) — per-document log importance weight
    ``sum_b cnt * lam_b`` plus the document's total hashed-gram count.

    The log-ratio table is O(n_buckets) and broadcast; the groupBy(id)
    reuses the (id, bucket) exchange ``hashed_ngram_counts`` already
    positioned. ``log_w`` is an exact DECIMAL sum — identical under any
    partitioning and in the DuckDB oracle. Models from
    ``importance_log_ratios`` cover the full bucket domain, so the
    lam-missing coalesce below is only a guard for hand-trimmed
    tables."""
    return (
        doc_counts.join(F.broadcast(log_ratios), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.sum(
                F.col("cnt") * F.coalesce(F.col("lam"), F.lit(0).cast(_DEC))
            ).cast(_DEC).alias("log_w"),
        )
    )


def gumbel_key(log_w: Column, id_col: Column, salt: str = "dsir") -> Column:
    """The Gumbel top-k resampling key ``log_w + Gumbel(0,1)`` with the
    noise derived from md5(salt || id) instead of an RNG: u in (0,1) is
    ``(first-8-hex-chars-of-md5 + 0.5) / 2^32`` (the +0.5 keeps u strictly
    inside (0,1)), and the Gumbel draw is ``-log(-log(u))``. Top-k by this
    key samples k documents without replacement with probability
    proportional to w — deterministically, reproducibly, and identically
    in the DuckDB oracle."""
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    return log_w.cast("double") - F.log(-F.log(u))


def importance_resample(
    raw_docs: DataFrame,
    target_docs: Optional[DataFrame],
    id_col: str,
    text_col: str,
    k: int,
    n_buckets: int = 4096,
    ns: Sequence[int] = (1, 2),
    alpha: float = 1.0,
    salt: str = "dsir",
    log_ratios: Optional[DataFrame] = None,
) -> DataFrame:
    """The one-call DSIR pipeline: fit p on ``target_docs`` and q on
    ``raw_docs`` (or reuse a persisted ``log_ratios`` model, in which
    case ``target_docs`` may be None), weight every raw document, and
    return the k Gumbel-top-k selected rows as
    (id, n_grams, log_w, sel_key).

    The selection is ``orderBy(desc).limit(k)`` — Spark plans this as
    TakeOrderedAndProject (per-partition partial top-k, k-row driver
    merge), not a global sort shuffle, so the select step is O(k) beyond
    the weight pass regardless of pool size."""
    raw_counts = hashed_ngram_counts(raw_docs, id_col, text_col, n_buckets, ns)
    if log_ratios is None:
        if target_docs is None:
            raise ValueError("pass target_docs= or a fitted log_ratios=")
        # raw_counts feeds BOTH the q-fit and the weight pass; without
        # the persist the raw corpus is tokenized and hashed twice
        # (tracked_persist: released at the next @query invocation).
        raw_counts = tracked_persist(raw_counts)
        target_counts = hashed_ngram_counts(
            target_docs, id_col, text_col, n_buckets, ns
        )
        log_ratios = importance_log_ratios(
            target_counts, raw_counts, n_buckets, alpha
        )
    weights = importance_log_weights(raw_counts, log_ratios, id_col)
    keyed = weights.withColumn(
        "sel_key", gumbel_key(F.col("log_w"), F.col(id_col), salt)
    )
    return keyed.orderBy(F.desc("sel_key"), F.col(id_col)).limit(k)


def hashed_kl_divergence(
    p_counts: DataFrame,
    q_counts: DataFrame,
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """One-row (kl_nats) frame: KL(p || q) between two corpora's
    smoothed hashed-n-gram distributions — the DSIR paper's selection
    diagnostic (a good selection moves the selected set's distribution
    toward the target: KL(target || selected) < KL(target || raw)).

    Pure composition of the fit machinery: both distributions are
    O(n_buckets) bucket tables, the divergence is one B-row sum —
    driver-trivial at any corpus size. Deterministic up to float
    summation over exactly B=n_buckets terms (a fixed-size reduce, not
    data-sized)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 (smoothing), got {alpha}")
    p = p_counts.groupBy("bucket").agg(F.sum("cnt").alias("p_b"))
    q = q_counts.groupBy("bucket").agg(F.sum("cnt").alias("q_b"))
    p_tot = p.agg(F.sum("p_b").alias("p_total"))
    q_tot = q.agg(F.sum("q_b").alias("q_total"))
    domain = (
        p_counts.sparkSession.range(n_buckets)
        .select(F.col("id").alias("bucket"))
    )
    joined = (
        domain.join(p, "bucket", "left")
        .join(q, "bucket", "left")
        .crossJoin(F.broadcast(p_tot))
        .crossJoin(F.broadcast(q_tot))
    )
    pp = (F.coalesce(F.col("p_b"), F.lit(0)) + alpha) / (
        F.coalesce(F.col("p_total"), F.lit(0)) + alpha * n_buckets
    )
    qq = (F.coalesce(F.col("q_b"), F.lit(0)) + alpha) / (
        F.coalesce(F.col("q_total"), F.lit(0)) + alpha * n_buckets
    )
    return joined.agg(
        F.sum(pp * (F.log(pp) - F.log(qq))).alias("kl_nats")
    )


def importance_resample_threshold(
    raw_docs: DataFrame,
    target_docs: Optional[DataFrame],
    id_col: str,
    text_col: str,
    expected_k: int,
    n_buckets: int = 4096,
    ns: Sequence[int] = (1, 2),
    alpha: float = 1.0,
    salt: str = "dsir",
    log_ratios: Optional[DataFrame] = None,
    relative_error: float = 0.001,
) -> DataFrame:
    """The corpus-scale selection path: ``importance_resample``'s exact
    top-k plans as TakeOrderedAndProject, which materializes k rows AT
    THE DRIVER — right for driver-sized k, wrong for "select 200M docs
    from 10B". This variant never moves documents to the driver: it
    sketches the Gumbel-key distribution (``approxQuantile`` — a
    mergeable sketch, one aggregation, one scalar back) to find the
    ~(1 - k/n) quantile and keeps every document whose key clears it —
    the SAME threshold rule the streaming selector applies, so batch and
    stream selection compose. Returns (id, n_grams, log_w, sel_key),
    ~``expected_k`` rows (the sketch's ``relative_error`` bounds the
    count deviation); the kept set is exactly the top-|result| by key,
    because thresholding a total order can never skip a higher key.

    Three passes over the weight frame (count, sketch, filter), all
    fully distributed and over the PERSISTED frame — none re-runs the
    corpus tokenization."""
    raw_counts = hashed_ngram_counts(raw_docs, id_col, text_col, n_buckets, ns)
    if log_ratios is None:
        if target_docs is None:
            raise ValueError("pass target_docs= or a fitted log_ratios=")
        raw_counts = tracked_persist(raw_counts)
        target_counts = hashed_ngram_counts(
            target_docs, id_col, text_col, n_buckets, ns
        )
        log_ratios = importance_log_ratios(
            target_counts, raw_counts, n_buckets, alpha
        )
    weights = importance_log_weights(raw_counts, log_ratios, id_col)
    keyed = tracked_persist(
        weights.withColumn(
            "sel_key", gumbel_key(F.col("log_w"), F.col(id_col), salt)
        )
    )
    n = keyed.count()
    if expected_k >= n:
        return keyed
    frac = 1.0 - expected_k / n
    (threshold,) = keyed.stat.approxQuantile(
        "sel_key", [frac], relative_error
    )
    return keyed.filter(F.col("sel_key") >= threshold)


def score_buckets(
    scored: DataFrame,
    score_col: str,
    part_col: str,
    id_col: str,
    n_buckets: int = 3,
    labels: Optional[Sequence[str]] = ("head", "middle", "tail"),
    ascending: bool = True,
) -> DataFrame:
    """Input columns + ``bucket`` (1..n) and optional ``bucket_label`` —
    the CCNet convention (Wenzek et al. 2020): split each language's
    documents into equal-sized perplexity terciles (head = best-scoring
    third) so downstream mixing can sample the buckets at different
    rates instead of hard-filtering on a global threshold.

    One NTILE window per ``part_col`` group — a single shuffle on the
    partition key; the tie-break on ``id_col`` makes the assignment
    deterministic under any partitioning (NTILE's fill order is the
    ORDER BY, and SQL engines agree on its floor-division group sizes).
    With ``ascending=True`` lower scores (= lower perplexity = better
    LM fit) land in bucket 1. At 100 TB the shuffle is by language —
    dozens of groups; skew toward English is real but NTILE is a
    streaming window (no per-group materialization beyond the sort),
    and the sort key is (score, id), spillable. ``labels`` must have
    exactly ``n_buckets`` entries (or pass None to keep just the
    number)."""
    from pyspark.sql import Window as W

    if labels is not None and len(labels) != n_buckets:
        raise ValueError("labels length must equal n_buckets")
    order = [
        F.col(score_col).asc() if ascending else F.col(score_col).desc(),
        F.col(id_col).asc(),
    ]
    w = W.partitionBy(part_col).orderBy(*order)
    out = scored.withColumn("bucket", F.ntile(n_buckets).over(w))
    if labels is not None:
        lab = F.array(*[F.lit(x) for x in labels])
        out = out.withColumn(
            "bucket_label", F.element_at(lab, F.col("bucket"))
        )
    return out
