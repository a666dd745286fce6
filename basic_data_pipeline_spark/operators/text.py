"""Text-analysis operators for a training-data pipeline: stats, quality
scoring, language ID, token counting, fingerprinting (SURVEY.md §2.11).

The reference has no text processing at all (its only string handling is
the CDC normalize path, /root/reference/consumer_to_file.py:88-113); these
operators make the `documents` table a first-class corpus surface.

Everything here is pure `pyspark.sql.functions` column expressions — no
Python UDFs anywhere. At 100 TB of text that is the difference between
whole-stage-codegen'd projections that saturate the scan and a
serde-bound Python hot loop. Each builder returns columns, so operators
compose into a single projection over one pass of the corpus.

Engine-parity note: every regex used here is restricted to syntax that
Java regex (Spark) and RE2 (DuckDB) interpret identically — explicit
character classes and \\x{...} unicode ranges, no \\w/\\b shorthands
(their unicode semantics differ between engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace-splitting regex, identical semantics in Java and RE2.
WS = r"\s+"

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-alnum
# non-space symbol. The shape GPT-2-style BPE pre-tokenization produces
# before merges.
BPE_ISH = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

# CJK unified ideographs (language-ID signal for zh).
CJK_CLASS = "[\\x{4e00}-\\x{9fff}]"

# Tiny high-frequency stopword profiles. Deliberately small: the operator
# demonstrates the n-gram/stopword-profile method; production would load
# real profiles as a broadcast table.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "los", "del"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"],
}


def tokens(text: Column) -> Column:
    """Lower-cased whitespace tokens."""
    return F.split(F.lower(text), WS)


def n_tokens(text: Column) -> Column:
    return F.size(tokens(text))


def sum_token_chars(text: Column) -> Column:
    """Total non-whitespace characters (= sum of token lengths)."""
    return F.length(F.regexp_replace(text, WS, ""))


def punct_ratio(text: Column) -> Column:
    """Share of characters that are neither ASCII-alphanumeric nor
    whitespace. (For non-Latin scripts this counts every letter — it is a
    Latin-centric heuristic, applied identically in the oracle.)"""
    return F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", "")) / F.length(text)


def upper_ratio(text: Column) -> Column:
    return F.length(F.regexp_replace(text, "[^A-Z]", "")) / F.length(text)


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of `lang` (duplicates count —
    frequency matters for language ID)."""
    return F.size(
        F.filter(tokens(text), lambda t: F.array_contains(F.array([F.lit(w) for w in STOPWORDS[lang]]), t))
    )


def cjk_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, f"[^{CJK_CLASS[1:-1]}]", ""))


def bpe_ish_token_count(text: Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH), 0))


def normalized_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lower-case, collapse whitespace
    runs to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(text), WS, " "))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text.
    Formatting-insensitive exact-dup key (the rolling-hash/winnowing
    generalization shares this normalize step; md5-of-canonical is the
    degenerate window-size=∞ case)."""
    return F.md5(normalized_text(text))


def quality_flags(text: Column) -> dict[str, Column]:
    """C4-style quality heuristics as named boolean columns."""
    nt = n_tokens(text)
    mean_len = sum_token_chars(text) / nt
    sw_ratio = stopword_hits(text, "en") / nt
    return {
        "enough_tokens": nt >= 20,
        "sane_token_len": (mean_len >= 3) & (mean_len <= 10),
        "has_stopwords": sw_ratio >= 0.02,
        "low_punct": punct_ratio(text) <= 0.2,
    }


def quality_score(text: Column) -> Column:
    """Mean of the quality flags in [0, 1]."""
    flags = list(quality_flags(text).values())
    total = flags[0].cast("int")
    for fl in flags[1:]:
        total = total + fl.cast("int")
    return total / F.lit(float(len(flags)))


def predicted_lang(text: Column) -> Column:
    """Heuristic language ID: CJK-dominant → zh; else the stopword profile
    with the most hits, ties broken in fixed order (en, de, es, fr).

    One pass over the token array per profile — all inside codegen. At
    corpus scale this is a narrow projection; the per-language profiles
    are compile-time constants (no join, no shuffle)."""
    hits = {lang: stopword_hits(text, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    pred = (
        F.when(cjk_count(text) * 3 >= F.length(text), F.lit("zh"))
        # fixed priority order resolves ties deterministically
        .when(hits["en"] == best, F.lit("en"))
        .when(hits["de"] == best, F.lit("de"))
        .when(hits["es"] == best, F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return pred


# --- PII scrubbing (training-data hygiene) --------------------------------

# Shared Java/RE2 syntax only (no lookarounds, no backrefs): the detector
# count in text_doc_profile and this scrubber must agree with the DuckDB
# oracle's regexp_extract_all on the same pattern.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone_ish": r"\+?\d[\d \-()]{7,}\d",
}


def scrub_pii(text: Column, kinds: tuple[str, ...] = ("email", "ipv4")) -> Column:
    """Mask PII spans with <KIND> sentinels — the scrub stage every
    training-data pipeline runs before tokenization. Pure chained
    regexp_replace: one codegen projection, no Python, embarrassingly
    parallel at any scale. Order matters (email before phone_ish: an
    address's digit runs must not be half-masked first), so `kinds`
    preserves caller order."""
    out = text
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def pii_counts(text: Column, kinds: tuple[str, ...] = ("email", "ipv4")) -> dict:
    """Per-kind detection counts (what scrub_pii would mask)."""
    return {k: F.regexp_count(text, F.lit(PII_PATTERNS[k])) for k in kinds}


# --- compression-ratio quality signal (mapInPandas, Arrow) ----------------

def compression_ratio(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document zlib compression ratio — the Gopher-style signal that
    separates natural text (~2-4×) from degenerate repetition (≫4×) and
    random noise (~1×). zlib is Python-side by necessity, so this is a
    sanctioned Arrow path: mapInPandas, one vectorized batch at a time,
    no per-row serde. Embarrassingly parallel, no shuffle.

    The id field of the output schema is DERIVED from the input (name and
    type), so string or non-long document ids work unchanged."""
    import zlib

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            docs.schema[id_col],
            T.StructField("n_bytes", T.IntegerType()),
            T.StructField("zlib_bytes", T.IntegerType()),
            T.StructField("compression_ratio", T.DoubleType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            raw = pdf[text_col].str.encode("utf-8")
            n = raw.map(len).astype("int32")
            z = raw.map(lambda b: len(zlib.compress(b, 6))).astype("int32")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n,
                    "zlib_bytes": z,
                    "compression_ratio": n / z,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, out_schema)


# --- corpus-trained bigram LM score (quality-filter signal) ---------------

def bigram_lm_scores(
    docs, id_col: str = "doc_id", text_col: str = "text", alpha: float = 0.5
):
    """(id, n_bigrams, lm_score): mean log2 P(w_i | w_{i-1}) per document
    under an add-alpha-smoothed bigram model trained ON THE CORPUS ITSELF
    — the self-perplexity signal quality pipelines threshold on (natural,
    in-distribution text scores high; shuffled or out-of-distribution
    word salad scores low) without any external LM artifact.

    Plan shape, all linear: one bigram explode, two count aggregations
    (C(w1,w2), C(w1)) keyed by bigram/unigram with map-side combine, one
    broadcast-eligible join of the doc bigrams against the conditional
    probabilities, one per-doc mean. The vocabulary size V is the single
    driver-side scalar (one bounded action). Docs with < 2 tokens have no
    bigrams and emit no row — left-join at the call site for a dense
    column."""
    from pyspark.sql import functions as F

    toks = F.split(F.lower(F.col(text_col)), WS)
    # Pure Column API (honors text_col) with try_element_at: under ANSI
    # mode element_at throws on out-of-range indexes, so a <2-token doc
    # must never reach an element_at(toks, 2). The size>=2 filter removes
    # those docs up front; try_element_at keeps the tail struct NULL-safe.
    d = docs.select(F.col(id_col), toks.alias("_toks")).where(
        F.size("_toks") >= 2
    )
    bi = d.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - F.lit(2)),
                lambda i: F.struct(
                    F.try_element_at(F.col("_toks"), i + F.lit(1)).alias("w1"),
                    F.try_element_at(F.col("_toks"), i + F.lit(2)).alias("w2"),
                ),
            )
        ).alias("b"),
    ).select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    bi = bi.filter(F.col("w2").isNotNull())

    c12 = bi.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bi.groupBy("w1").agg(F.count("*").alias("c1"))
    v = docs.select(
        F.explode(toks).alias("w")
    ).select("w").distinct().count()

    prob = c12.join(c1, "w1").select(
        "w1",
        "w2",
        (
            F.log2((F.col("c12") + F.lit(alpha)) / (F.col("c1") + F.lit(alpha * v)))
        ).alias("lp"),
    )
    return (
        bi.join(prob, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg("lp").alias("lm_score"),
        )
    )


# --- within-document repetition profile (Gopher/MassiveText filters) ------

def repetition_profile(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (2, 3),
):
    """(id, n, total_ngrams, top_ngram_count, dup_ngram_count,
    top_ngram_frac, dup_ngram_frac): within-document token n-gram
    repetition — the MassiveText/Gopher family of repetition filters
    ("fraction of tokens in the most common n-gram", "fraction of n-gram
    occurrences that are repeats"). Degenerate boilerplate ("click here
    click here ...") scores near 1.0 on both; natural prose scores low.
    One row per (document, n); documents with < n tokens have no n-grams
    and emit no row for that n — left-join at the call site.

    Plan shape, per n: one n-gram explode (linear in tokens), one count
    aggregation keyed by (doc, gram) with map-side combine, one per-doc
    aggregation — both shuffles are keyed by the document id, so the
    operator partitions cleanly at any corpus size; no pair space, no
    driver-side state. The fractions are single integer divisions
    (deterministic, oracle-bit-identical — no float accumulation)."""
    frames = []
    toks = tokens(F.col(text_col))
    for n in ns:
        grams = (
            docs.select(F.col(id_col), toks.alias("_tk"))
            .where(F.size("_tk") >= n)
            .select(
                F.col(id_col),
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size("_tk") - F.lit(n)),
                        lambda i: F.array_join(
                            F.slice(F.col("_tk"), i + F.lit(1), F.lit(n)), " "
                        ),
                    )
                ).alias("g"),
            )
        )
        counted = grams.groupBy(id_col, "g").agg(F.count("*").alias("c"))
        stats = counted.groupBy(id_col).agg(
            F.sum("c").alias("total_ngrams"),
            F.max("c").alias("top_ngram_count"),
            F.coalesce(
                F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)
            ).alias("dup_ngram_count"),
        )
        frames.append(stats.withColumn("n", F.lit(n)))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select(
        id_col,
        "n",
        "total_ngrams",
        "top_ngram_count",
        "dup_ngram_count",
        (F.col("top_ngram_count") / F.col("total_ngrams")).alias(
            "top_ngram_frac"
        ),
        (F.col("dup_ngram_count") / F.col("total_ngrams")).alias(
            "dup_ngram_frac"
        ),
    )


# --- TF-IDF salient terms (corpus-relative keyword extraction) ------------

def tfidf_top_terms(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
):
    """(id, term, tf, df, tfidf, rank): each document's top-``k`` terms by
    TF-IDF with the smoothed idf = ln((N+1)/(df+1)) + 1 (sklearn's
    formulation — never zero, defined for unseen terms). The corpus-
    relative salience signal: terms that are frequent IN the document but
    rare ACROSS the corpus; the building block for keyword extraction,
    topical clustering, and mixture diagnostics.

    Plan shape, all linear: one token explode → (doc, term) counts (tf,
    map-side combine) → document frequency from the same frame (term-
    keyed count) → one term-keyed join → per-doc top-k window. N (corpus
    size) is the single driver-side scalar, same bounded-action pattern
    as bigram_lm_scores' vocabulary size. Ties break by term for
    determinism."""
    from pyspark.sql.window import Window as W

    n_docs = docs.count()
    tf = (
        docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = W.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        tf.join(df_, "term")
        .withColumn(
            "tfidf",
            F.col("tf")
            * (F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )


# --- line-level cleaning (C4) and document rules (Gopher) -----------------

# Terminal punctuation accepted by the C4 line rule (Raffel et al. 2020:
# "only retained lines that ended in a terminal punctuation mark").
C4_TERMINAL_RE = '[.!?"]$'

# Phrases whose presence drops a LINE in the C4 recipe (cookie-notice
# boilerplate) and phrases/characters that drop the whole DOCUMENT.
C4_BAD_LINE_MARKERS = ("javascript", "cookie policy", "uses cookies")
C4_BAD_DOC_MARKERS = ("lorem ipsum", "{")


def c4_line_clean(
    text: Column,
    min_words: int = 5,
    min_kept_lines: int = 3,
    bad_line_markers: tuple[str, ...] = C4_BAD_LINE_MARKERS,
    bad_doc_markers: tuple[str, ...] = C4_BAD_DOC_MARKERS,
) -> dict[str, Column]:
    """The C4 cleaning stage (Raffel et al. 2020 §2.2) as named columns:
    per-LINE keep rules (ends in terminal punctuation, >= ``min_words``
    words, no boilerplate marker) applied inside one higher-order
    ``filter`` over ``split(text, '\\n')``, plus the per-DOCUMENT drops
    (curly brace = code, "lorem ipsum", fewer than ``min_kept_lines``
    surviving lines).

    Returns ``n_lines``, ``n_kept``, ``cleaned`` (kept lines re-joined
    with newlines, the column downstream stages consume) and ``keep_doc``.
    Everything is a zero-shuffle codegen projection — the corpus is
    touched once, embarrassingly parallel at any scale; compose with
    ``quality_flags``/``gopher_quality_flags`` in the same projection."""
    lines = F.split(text, "\n")

    def _keep(line: Column) -> Column:
        t = F.trim(line)
        low = F.lower(t)
        ok = t.rlike(C4_TERMINAL_RE) & (
            F.size(F.split(t, WS)) >= F.lit(min_words)
        )
        for marker in bad_line_markers:
            ok = ok & ~low.contains(F.lit(marker))
        return ok

    kept = F.filter(lines, _keep)
    n_kept = F.size(kept)
    doc_ok = n_kept >= F.lit(min_kept_lines)
    low_doc = F.lower(text)
    for marker in bad_doc_markers:
        doc_ok = doc_ok & ~low_doc.contains(F.lit(marker))
    return {
        "n_lines": F.size(lines),
        "n_kept": n_kept,
        "cleaned": F.array_join(kept, "\n"),
        "keep_doc": doc_ok,
    }


# The 8-word "must contain 2 of these" list from Gopher's quality rules
# (Rae et al. 2021, table A1).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
) -> dict[str, Column]:
    """The Gopher/MassiveText document-quality rule battery (Rae et al.
    2021 §A.1.1) as named boolean columns plus the underlying measures:

    * ``word_count_ok``   — ``min_words <= n <= max_words``
    * ``mean_word_len_ok``— mean word length in [3, 10]
    * ``symbol_ratio_ok`` — (# of '#' + '...') / words <= 0.1
    * ``bullet_ratio_ok`` — <= 90% of lines start with a bullet
    * ``ellipsis_ratio_ok``— <= 30% of lines end with '...'
    * ``alpha_ratio_ok``  — >= 80% of words contain a letter
    * ``stopwords_ok``    — contains >= 2 of the 8 Gopher stopwords

    (The repetition rules of the same battery live in
    ``repetition_profile`` — they need n-gram aggregation; everything
    here is one zero-shuffle codegen projection, so the full battery is
    a single corpus pass.) Measures exposed: ``n_words``,
    ``mean_word_len``, ``alpha_word_ratio``."""
    toks = tokens(text)
    n = F.size(toks)
    nd = n.cast("double")
    mean_wlen = sum_token_chars(text) / nd
    symbols = (
        F.regexp_count(text, F.lit("#")) + F.regexp_count(text, F.lit(r"\.\.\."))
    ).cast("double")
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("double")
    bullets = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike("^[-*•]"))
    ).cast("double")
    ellipsis = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"\.\.\.$"))
    ).cast("double")
    alpha = F.size(
        F.filter(toks, lambda t: t.rlike("[a-z]"))
    ).cast("double") / nd
    sw = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(toks, s),
        )
    )
    return {
        "n_words": n,
        "mean_word_len": mean_wlen,
        "alpha_word_ratio": alpha,
        "word_count_ok": (n >= F.lit(min_words)) & (n <= F.lit(max_words)),
        "mean_word_len_ok": (mean_wlen >= 3.0) & (mean_wlen <= 10.0),
        "symbol_ratio_ok": symbols / nd <= 0.1,
        "bullet_ratio_ok": bullets / n_lines <= 0.9,
        "ellipsis_ratio_ok": ellipsis / n_lines <= 0.3,
        "alpha_ratio_ok": alpha >= 0.8,
        "stopwords_ok": sw >= 2,
    }


def gopher_rule_mask(text: Column) -> Column:
    """The seven Gopher rules packed into one integer bitmask (bit i set
    = rule i passed, in the docstring order of ``gopher_quality_flags``)
    — the compact form a corpus pipeline persists per document so any
    rule subset can be re-filtered later without re-scanning text."""
    flags = gopher_quality_flags(text)
    bits = [
        "word_count_ok", "mean_word_len_ok", "symbol_ratio_ok",
        "bullet_ratio_ok", "ellipsis_ratio_ok", "alpha_ratio_ok",
        "stopwords_ok",
    ]
    mask = F.lit(0)
    for i, name in enumerate(bits):
        mask = mask + flags[name].cast("int") * F.lit(1 << i)
    return mask.cast("long")
