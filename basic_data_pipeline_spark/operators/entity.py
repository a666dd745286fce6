"""Entity resolution: edit-distance similarity join with prefix filtering.

The fuzzy-key join a data pipeline needs when records lack a shared
surrogate key (names/titles/addresses with typos). A bare
``levenshtein(a, b) <= k`` predicate has no equi component, so Spark
would plan a nested-loop cross product — quadratic and dead at scale.
This module implements the production shape (the prefix-filtering
similarity join of Chaudhuri et al. / PPJoin, in DataFrame form):

1. q-gram tokenization of the normalized string (lower+trim);
2. a GLOBAL gram-frequency table (vocab-sized aggregation) defines one
   total order (rarest first) shared by every string;
3. each string keeps only its ``k·q + 1`` rarest grams — the PREFIX.
   Pigeonhole: one edit destroys at most ``q`` grams, so two strings
   within edit distance k share all but ≤ k·q grams; if the longer side
   has more than k·q grams, the two prefixes must intersect. Strings
   with ≤ k·q grams can evade that bound (two tiny strings can be
   within k while sharing nothing), so every SHORT string also carries a
   sentinel gram — shorts all land in one block, which is exact and
   cheap because "short" means ≤ k·q + q − 1 characters;
4. candidates = equi-join on prefix grams (+ a length pre-filter:
   length difference > k already implies distance > k), deduplicated;
5. verify with the built-in ``levenshtein`` on the candidate pairs only.

The equi-join carries (id, gram, length) — texts are joined back by id
for the verify step, so the wide string never rides the candidate
shuffle. Rarity ordering is a performance choice only; correctness
needs any consistent global order, which the tests pin by comparing
against the brute-force predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from basic_data_pipeline_spark.caching import tracked_persist

_SHORT = "\x00short"


def _norm(c: Column) -> Column:
    return F.lower(F.trim(c))


def qgrams(c: Column, q: int) -> Column:
    """Distinct character q-grams of a normalized string; strings shorter
    than q contribute themselves as their single gram."""
    s = _norm(c)
    n = F.length(s)
    return F.when(n <= q, F.array(s)).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - q + 1),
                lambda i: F.substring(s, i, q),
            )
        )
    )


def _prefix_grams(
    tagged: DataFrame, max_edit: int, q: int
) -> DataFrame:
    """(_side, id, _len, gram): each string's k·q+1 globally-rarest grams
    (+ the short-string sentinel where the pigeonhole bound is vacuous).
    ``tagged`` must have columns (_side, _id, _txt)."""
    k = max_edit
    grams = tagged.select(
        "_side", "_id", F.length(_norm(F.col("_txt"))).alias("_len"),
        F.explode(qgrams(F.col("_txt"), q)).alias("gram"),
    )
    # NOT persisted (r12): the gram explode is consumed by the freq agg
    # and the ranked join (and the caller self-joins the result), but
    # per-site interleaved A/B on join_range_cross measured the persist
    # as a cache barrier — exec median 4.42 (persisted) vs 4.08 with
    # this site alone unpersisted, 2.82 with the candidate persist below
    # also removed. The duplicated explode branches run concurrently;
    # a cache build serializes them and drops AQE (guide §5). At a
    # scale where recomputing the explode dominates scheduling, persist
    # again — measure there, not here.
    freq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("_f"))
    ranked = (
        grams.join(freq, "gram")
        .withColumn(
            "_rk",
            F.row_number().over(
                W.partitionBy("_side", "_id").orderBy(
                    F.asc("_f"), F.asc("gram")
                )
            ),
        )
    )
    prefix = ranked.filter(F.col("_rk") <= k * q + 1).select(
        "_side", "_id", "_len", "gram"
    )
    shorts = (
        grams.groupBy("_side", "_id", "_len")
        .agg(F.count(F.lit(1)).alias("_ng"))
        .filter(F.col("_ng") <= k * q)
        .select("_side", "_id", "_len", F.lit(_SHORT).alias("gram"))
    )
    return prefix.unionByName(shorts)


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_edit: int = 1,
    q: int = 3,
) -> DataFrame:
    """(id_a, id_b, dist): every unordered pair (id_a < id_b) whose
    normalized ``text_col`` values are within ``max_edit`` Levenshtein
    distance — EXACT result via the prefix-filtered candidate join (see
    module docstring), never a cross product.

    The verify stage joins the normalized text frame back by id; that
    frame is pruned to PARTICIPANT ids first (one semi-join on the
    candidate id set — the dedup.jaccard_verify rule, SCALING.md round
    8). Without the prune, both verify joins shuffle the whole corpus's
    normalized text to score a candidate-sized pair set; with it, AQE
    broadcasts the pruned side when candidates are few, and the
    degenerate everyone-is-a-candidate case costs one extra linear
    pass. Pruning is by id only, so verify distances are unchanged."""
    tagged = df.select(
        F.lit("s").alias("_side"),
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_txt"),
    )
    pg = _prefix_grams(tagged, max_edit, q)
    cand = (
        pg.alias("a")
        .join(
            pg.alias("b"),
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a._id") < F.col("b._id"))
            & (
                F.abs(F.col("a._len") - F.col("b._len")) <= max_edit
            ),
        )
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .distinct()
    )
    # NOT persisted (r12): three consumers (the participant prune + the
    # two verify joins) recompute the candidate join as concurrent
    # branches — interleaved A/B on join_range_cross: exec median 4.42
    # with both this and the gram persist on, 3.68 with this site alone
    # off, 2.82 with both off (n=6, all > 2·sem). Same cache-barrier
    # mechanism as the r11 headline regressions (guide §5). On a
    # cluster where the candidate join's data cost dominates the job
    # floor, re-persist — the r8 SCALING.md participant-prune analysis
    # still holds either way.
    part = (
        cand.select(F.col("id_a").alias("_tid"))
        .unionByName(cand.select(F.col("id_b").alias("_tid")))
        .distinct()
    )
    txt = df.select(
        F.col(id_col).alias("_tid"), _norm(F.col(text_col)).alias("_t")
    ).join(part, "_tid", "left_semi")
    return (
        cand.join(txt.withColumnRenamed("_tid", "id_a"), "id_a")
        .withColumnRenamed("_t", "_ta")
        .join(txt.withColumnRenamed("_tid", "id_b"), "id_b")
        .withColumn("dist", F.levenshtein(F.col("_ta"), F.col("_t")))
        .filter(F.col("dist") <= max_edit)
        .select("id_a", "id_b", "dist")
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_edit: int = 1,
    q: int = 3,
) -> DataFrame:
    """(id, entity_id): canonical entity assignment — connected
    components over the fuzzy-pair graph (typo chains a~b~c collapse to
    one entity even when a and c differ by 2k), unpaired records keep
    their own id. Composition of ``fuzzy_pairs`` with the dedup
    component machinery (operators/dedup.py duplicate_clusters —
    pointer-jumped min-label propagation, O(log diameter) rounds)."""
    from basic_data_pipeline_spark.operators.dedup import duplicate_clusters

    pairs = fuzzy_pairs(df, id_col, text_col, max_edit, q).select(
        F.col("id_a"), F.col("id_b")
    )
    clusters = duplicate_clusters(
        pairs.withColumn("jaccard", F.lit(1.0))
    ).select(
        F.col("doc_id").alias(id_col), F.col("cluster").alias("entity_id")
    )
    return df.select(id_col).join(clusters, id_col, "left").select(
        id_col,
        F.coalesce(F.col("entity_id"), F.col(id_col)).alias("entity_id"),
    )


def fuzzy_join(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    text_col: str,
    max_edit: int = 1,
    q: int = 3,
) -> DataFrame:
    """(id_a, id_b, dist): the two-table variant — every (a-row, b-row)
    pair within ``max_edit``. The gram-frequency order is computed over
    the UNION of both sides so the two prefixes are consistent. Each
    side's text frame is pruned to its participant ids before the
    verify joins (same rule as ``fuzzy_pairs``)."""
    tagged = a.select(
        F.lit("a").alias("_side"),
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_txt"),
    ).unionByName(
        b.select(
            F.lit("b").alias("_side"),
            F.col(id_col).alias("_id"),
            F.col(text_col).alias("_txt"),
        )
    )
    pg = _prefix_grams(tagged, max_edit, q)
    cand = (
        pg.filter(F.col("_side") == "a").alias("x")
        .join(
            pg.filter(F.col("_side") == "b").alias("y"),
            (F.col("x.gram") == F.col("y.gram"))
            & (F.abs(F.col("x._len") - F.col("y._len")) <= max_edit),
        )
        .select(
            F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b")
        )
        .distinct()
    )
    cand = tracked_persist(cand)
    ta = a.select(
        F.col(id_col).alias("id_a"), _norm(F.col(text_col)).alias("_ta")
    ).join(cand.select("id_a").distinct(), "id_a", "left_semi")
    tb = b.select(
        F.col(id_col).alias("id_b"), _norm(F.col(text_col)).alias("_tb")
    ).join(cand.select("id_b").distinct(), "id_b", "left_semi")
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("dist", F.levenshtein(F.col("_ta"), F.col("_tb")))
        .filter(F.col("dist") <= max_edit)
        .select("id_a", "id_b", "dist")
    )
