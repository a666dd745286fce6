"""Scale-technique operators surfaced as oracle-checked queries:
hierarchical rollup re-aggregation, salted skew-proof aggregation,
exact quantiles. These are the plan shapes that keep working when the
input grows 1000× — each oracle proves the technique changes the
EXECUTION, not the answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from basic_data_pipeline_spark.catalog import load_table
from basic_data_pipeline_spark.operators import rollup
from basic_data_pipeline_spark.queries import graph_ctes as GC
from basic_data_pipeline_spark.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return load_table(spark, sf_dir, name)


@query(
    "rollup_hourly_to_daily",
    oracle=f"""
    WITH RECURSIVE {GC._EDGE_CTES},
    {GC._SCC_CTES},
    {GC._LPA_CTES},
    e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                      event_type, value
               FROM events),
    lagged AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM e),
    flagged AS (
      SELECT user_id, event_id, us,
             CASE WHEN prev IS NULL OR us - prev > 14400000000
                  THEN 1 ELSE 0 END AS is_new
      FROM lagged),
    sess AS (
      SELECT user_id, us,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged),
    stats AS (
      SELECT user_id, session_seq, count(*) AS n,
             (max(us) - min(us)) / 1000000.0 AS dur
      FROM sess GROUP BY 1, 2),
    f1 AS (SELECT user_id, min(epoch_us(ts)) AS t FROM e
           WHERE event_type = 'view' GROUP BY 1),
    f2 AS (SELECT e.user_id, min(epoch_us(ts)) AS t FROM e
           JOIN f1 ON e.user_id = f1.user_id
           WHERE event_type = 'click' AND epoch_us(ts) >= f1.t GROUP BY 1),
    f3 AS (SELECT e.user_id, min(epoch_us(ts)) AS t FROM e
           JOIN f2 ON e.user_id = f2.user_id
           WHERE epoch_us(ts) >= f2.t AND event_type = 'purchase'
           GROUP BY 1),
    gfsrc AS (SELECT user_id,
                     CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(ts)) AS BIGINT) % 3600 AS b,
                     round(CAST(sum(CAST(value AS DECIMAL(38,6)))
                                AS DOUBLE) / count(*), 6) AS v
              FROM e WHERE user_id < 5 GROUP BY 1, 2),
    gfb AS (SELECT min(b) AS lo, max(b) AS hi FROM gfsrc),
    gfgrid AS (SELECT k.user_id, g.b
               FROM (SELECT DISTINCT user_id FROM gfsrc) k
               CROSS JOIN gfb
               CROSS JOIN UNNEST(generate_series(lo, hi, 3600)) AS g(b)),
    gfj AS (SELECT g.user_id, g.b, s.v, s.v IS NULL AS filled
            FROM gfgrid g LEFT JOIN gfsrc s USING (user_id, b)),
    gflc AS (SELECT user_id, b, filled,
                    last_value(v IGNORE NULLS) OVER
                      (PARTITION BY user_id ORDER BY b
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS fv
             FROM gfj),
    gfin AS (SELECT user_id, b, filled, v,
                    last_value(v IGNORE NULLS) OVER wprec AS pv,
                    last_value(CASE WHEN v IS NOT NULL THEN b END
                               IGNORE NULLS) OVER wprec AS pb,
                    first_value(v IGNORE NULLS) OVER wfoll AS nv,
                    first_value(CASE WHEN v IS NOT NULL THEN b END
                                IGNORE NULLS) OVER wfoll AS nb
             FROM gfj
             WINDOW wprec AS (PARTITION BY user_id ORDER BY b
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW),
                    wfoll AS (PARTITION BY user_id ORDER BY b
                              ROWS BETWEEN CURRENT ROW
                                       AND UNBOUNDED FOLLOWING)),
    lpts AS (SELECT user_id, b, v,
                    row_number() OVER (PARTITION BY user_id
                                       ORDER BY b, v) AS rn,
                    count(*) OVER (PARTITION BY user_id) AS cnt
             FROM gfsrc),
    lbkt AS (SELECT user_id, b, v,
                    CASE WHEN cnt <= 20 THEN rn - 1
                         WHEN rn = 1 THEN 0
                         WHEN rn = cnt THEN 19
                         ELSE 1 + ((rn - 2) * 18) // (cnt - 2)
                    END AS bkt
             FROM lpts),
    lcent AS (SELECT user_id, bkt,
                     CAST(sum(CAST(b AS DECIMAL(38,6))) AS DOUBLE)
                       / count(*) AS ct,
                     CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE)
                       / count(*) AS cv
              FROM lbkt GROUP BY 1, 2),
    lanch AS (SELECT user_id, bkt,
                     lag(ct) OVER wbk AS pt, lag(cv) OVER wbk AS pv,
                     lead(ct) OVER wbk AS nt, lead(cv) OVER wbk AS nv
              FROM lcent
              WINDOW wbk AS (PARTITION BY user_id ORDER BY bkt)),
    lsel AS (SELECT p.user_id, p.bkt, p.b, p.v,
                    row_number() OVER (
                      PARTITION BY p.user_id, p.bkt
                      ORDER BY abs((a.pt - a.nt) * (p.v - a.pv)
                                   - (a.pt - p.b) * (a.nv - a.pv))
                               DESC NULLS LAST, p.b) AS pick
             FROM lbkt p
             JOIN lanch a ON a.user_id = p.user_id AND a.bkt = p.bkt),
    lmed AS (SELECT user_id, median(v) AS med FROM gfsrc GROUP BY 1),
    ldev AS (SELECT g.user_id, g.b, g.v, m.med,
                    abs(g.v - m.med) AS adev
             FROM gfsrc g JOIN lmed m ON m.user_id = g.user_id),
    lmad AS (SELECT user_id, median(adev) AS mad FROM ldev GROUP BY 1),
    lanom AS (SELECT d.user_id, d.b,
                     CASE WHEN m.mad <> 0
                          THEN CAST(0.6745 AS DOUBLE) * (d.v - d.med) / m.mad
                     END AS score,
                     CASE WHEN m.mad = 0 THEN d.v <> d.med
                          ELSE abs(CAST(0.6745 AS DOUBLE) * (d.v - d.med)
                                   / m.mad) > 2.5
                     END AS fl
              FROM ldev d JOIN lmad m ON m.user_id = d.user_id)
    SELECT 'daily' AS branch, CAST(CAST(ts AS DATE) AS VARCHAR) AS k1,
           event_type AS k2, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
    FROM e GROUP BY 2, 3
    UNION ALL
    SELECT 'sess', CAST(user_id AS VARCHAR), CAST(session_seq AS VARCHAR),
           n, CAST(dur AS DOUBLE)
    FROM stats
    UNION ALL
    SELECT 'funnel', '1', 'view', (SELECT count(*) FROM f1), NULL
    UNION ALL
    SELECT 'funnel', '2', 'click', (SELECT count(*) FROM f2), NULL
    UNION ALL
    SELECT 'funnel', '3', 'purchase', (SELECT count(*) FROM f3), NULL
    UNION ALL
    SELECT 'gfl', CAST(user_id AS VARCHAR), CAST(b AS VARCHAR),
           CAST(filled AS BIGINT), round(fv, 6) + 0.0
    FROM gflc
    UNION ALL
    SELECT 'gfi', CAST(user_id AS VARCHAR), CAST(b AS VARCHAR),
           CAST(filled AS BIGINT),
           CASE WHEN NOT filled THEN v
                WHEN pv IS NOT NULL AND nv IS NOT NULL
                THEN round(pv + (nv - pv)
                           * ((b - pb) * 1.0 / (nb - pb)), 6) + 0.0
                ELSE NULL END
    FROM gfin
    UNION ALL
    SELECT 'lttb', CAST(user_id AS VARCHAR), CAST(bkt AS VARCHAR),
           b, round(v, 6) + 0.0
    FROM lsel WHERE pick = 1
    UNION ALL
    SELECT 'anom', CAST(user_id AS VARCHAR), CAST(b AS VARCHAR),
           CAST(fl AS BIGINT), round(score, 6) + 0.0
    FROM lanom
    UNION ALL
    SELECT 'scc', CAST(node AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(scc_id AS BIGINT), CAST(NULL AS DOUBLE)
    FROM sccl
    UNION ALL
    SELECT 'lpa', CAST(node AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(label AS BIGINT), CAST(NULL AS DOUBLE)
    FROM lpa{GC._LPA_ITERS}
    """,
)
def rollup_hourly_to_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-stream analytics tag-union, three branches over the same
    facts (merged r6 so sessionization/funnels are driver-checked without
    a new registry slot):

    `daily` — two-level additive rollup: raw events → hour×type partials
    → day×type. The oracle aggregates the RAW facts directly, proving the
    hierarchical path is lossless (the additivity invariant continuous
    aggregates depend on). At 100 TB the hourly level is materialized
    once (operators/rollup.py `materialize_rollup`) and every coarser
    query reads it instead of the facts.

    `sess` — gap-based sessionization (operators/sessions.py, 4 h gap)
    + per-session stats; the batch analogue of the streaming session
    windows, one user-hash shuffle, integer-micros gap arithmetic so the
    oracle replays the identical boundaries.

    `funnel` — strict-order view→click→purchase user funnel: first
    qualifying step-i event at-or-after the first qualifying step-(i-1)
    event; counts are non-increasing by construction."""
    from basic_data_pipeline_spark.operators import sessions

    e = _t(spark, sf_dir, "events")
    daily = rollup.reaggregate_daily(rollup.hourly_rollup(e)).select(
        F.lit("daily").alias("branch"),
        F.col("date").cast("string").alias("k1"),
        F.col("event_type").alias("k2"),
        F.col("n").alias("n"),
        F.col("value_sum").alias("v"),
    )
    sess = sessions.session_stats(
        sessions.sessionize(e, gap_seconds=14400.0), value_col=None
    ).select(
        F.lit("sess").alias("branch"),
        F.col("user_id").cast("string").alias("k1"),
        F.col("session_seq").cast("string").alias("k2"),
        F.col("n_events").alias("n"),
        F.col("duration_s").cast("double").alias("v"),
    )
    fun = sessions.funnel_counts(e, ["view", "click", "purchase"]).select(
        F.lit("funnel").alias("branch"),
        F.col("step_no").cast("string").alias("k1"),
        F.col("step").alias("k2"),
        F.col("users_reached").alias("n"),
        F.lit(None).cast("double").alias("v"),
    )
    # gfl/gfi branches (r8-close, operators/timeseries.py): hypertable
    # gap filling — hourly per-user mean series for users < 5, densified
    # over the global [min, max] bucket range, filled by LOCF and by
    # linear interpolation. Bucket values are 6-place-rounded BEFORE the
    # fill rules (decimal-sum / count — the engine float convention), so
    # carried and interpolated values are bit-identical in DuckDB; the
    # `filled` flag rides in n, proving the densified GRID (not just the
    # fills) matches.
    from basic_data_pipeline_spark.operators import timeseries as TS

    hb = (
        e.filter(F.col("user_id") < 5)
        .groupBy(
            "user_id", TS.time_bucket(F.col("ts"), 3600).alias("b")
        )
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("v")
        )
    )
    def _gf_rows(method: str, tag: str):
        return TS.gapfill(hb, "user_id", "b", "v", 3600, method).select(
            F.lit(tag).alias("branch"),
            F.col("user_id").cast("string").alias("k1"),
            F.col("b").cast("string").alias("k2"),
            F.col("filled").cast("long").alias("n"),
            (F.round("v", 6) + F.lit(0.0)).alias("v"),
        )

    # lttb/anom branches (r8-close, operators/timeseries.py): parallel-
    # anchor LTTB downsampling (bucket id in k2, the chosen point's time
    # in n — pinning exactly WHICH point each bucket elected) and
    # modified-z-score MAD anomaly flags (flag in n, 6-rounded score in
    # v). Centroids use the decimal-sum/_davg convention and bucket
    # boundaries integer division, so the argmax and the flags are
    # bit-reproducible in DuckDB.
    lttb = TS.lttb_downsample(hb, "user_id", "b", "v", 20).select(
        F.lit("lttb").alias("branch"),
        F.col("user_id").cast("string").alias("k1"),
        F.col("bucket").cast("string").alias("k2"),
        F.col("b").alias("n"),
        (F.round("v", 6) + F.lit(0.0)).alias("v"),
    )
    anom = TS.mad_anomalies(hb, "user_id", "b", "v", threshold=2.5).select(
        F.lit("anom").alias("branch"),
        F.col("user_id").cast("string").alias("k1"),
        F.col("b").cast("string").alias("k2"),
        F.col("is_anomaly").cast("long").alias("n"),
        (F.round("score", 6) + F.lit(0.0)).alias("v"),
    )
    # scc/lpa branches (moved from text_lang_token in round 9 — see
    # queries/graph_ctes.py): the REAL distributed FW-BW SCC
    # decomposition and the deterministic synchronous label propagation
    # over the synthetic doc_id crawl graph. The oracle cross-checks scc
    # with an independent WITH RECURSIVE transitive-closure formulation
    # and replays lpa's fixed-round recurrence CTE-by-CTE.
    from basic_data_pipeline_spark.operators import linkgraph

    d = _t(spark, sf_dir, "documents")
    pg_edges = GC.synthetic_crawl_edges(d)
    nv = F.lit(None).cast("double")
    sccb = linkgraph.strongly_connected_components(pg_edges).select(
        F.lit("scc").alias("branch"),
        F.col("node").cast("string").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.col("scc_id").alias("n"),
        nv.alias("v"),
    )
    lpab = linkgraph.label_propagation(
        pg_edges, iterations=GC._LPA_ITERS
    ).select(
        F.lit("lpa").alias("branch"),
        F.col("node").cast("string").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.col("label").alias("n"),
        nv.alias("v"),
    )
    return (
        daily.unionByName(sess)
        .unionByName(fun)
        .unionByName(_gf_rows("locf", "gfl"))
        .unionByName(_gf_rows("linear", "gfi"))
        .unionByName(lttb)
        .unionByName(anom)
        .unionByName(sccb)
        .unionByName(lpab)
    )


@query(
    "agg_salted_skew",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS value_sum,
           quantile_cont(value, 0.5)  AS p50,
           quantile_cont(value, 0.9)  AS p90,
           quantile_cont(value, 0.99) AS p99
    FROM events GROUP BY event_type
    """,
    headline=True,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over a 5-value key — the skew shape
    where a plain groupBy leaves all but 5 reducers idle (AQE splits
    skewed JOIN partitions, not aggregation keys). Decimal accumulation
    makes the salted result bit-equal to the direct oracle sum no matter
    how the salt split the rows.

    Joined (broadcast, 5 rows) with exact interpolated per-group
    quantiles (Spark `percentile` == DuckDB `quantile_cont`, both linear
    interpolation; merges r1's agg_percentiles) — the scale path swaps in
    `approx_percentile` (t-digest, mergeable, one pass) when exactness
    can yield; kept exact here so the oracle can check values."""
    e = _t(spark, sf_dir, "events")
    salted = rollup.salted_sum(e, "event_type", "value")
    pct = e.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.9).alias("p90"),
        F.percentile("value", 0.99).alias("p99"),
    )
    return salted.join(F.broadcast(pct), "event_type")


@query(
    "join_asof_union_window",
    oracle="""
    WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                      max(value) AS purchase_value
               FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
    l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
          FROM events)
    SELECT l.event_id, l.user_id, l.ts, l.event_type,
           p.purchase_value AS purchase_value_asof
    FROM l ASOF LEFT JOIN p ON l.user_id = p.user_id AND l.ts >= p.ts
    """,
    headline=True,
)
def join_asof_union_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General as-of join via union+window (operators/asof.py): each event
    carries the user's most recent purchase value at-or-before its
    timestamp. Linear in |left|+|right| with ONE shuffle — vs the
    range-join+row_number form that explodes per-key pairs
    (join_asof_latest_event shows that form). The oracle is DuckDB's
    native ASOF LEFT JOIN."""
    from basic_data_pipeline_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    left = e.select("event_id", "user_id", "ts", "event_type")
    return asof_join(left, purchases, "user_id", "ts", ["purchase_value"])


@query(
    "join_salted_skew",
    oracle=f"""
    WITH {GC._PG_CTES},
    {GC._HITS_CTES},
    {GC._TRI_CTES},
    {GC._CORE_CTES}
    SELECT 'join' AS kind, CAST(e.event_id AS VARCHAR) AS k1,
           e.event_type AS k2, CAST(d.type_rank AS BIGINT) AS n1,
           CAST(NULL AS BIGINT) AS n2
    FROM events e
    JOIN (SELECT event_type, row_number() OVER (ORDER BY event_type)
            AS type_rank
          FROM (SELECT DISTINCT event_type FROM events)) d
      ON e.event_type = d.event_type
    UNION ALL
    SELECT 'pagerank', CAST(node AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(rank AS BIGINT), CAST(deg AS BIGINT)
    FROM pgit{GC._PG_ITERS}
    UNION ALL
    SELECT 'hits', CAST(h.node AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(h.hub AS BIGINT), CAST(a.auth AS BIGINT)
    FROM ht{GC._HITS_ITERS} h JOIN at{GC._HITS_ITERS} a ON h.node = a.node
    UNION ALL
    SELECT 'core', CAST(node AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(core AS BIGINT), CAST(NULL AS BIGINT)
    FROM cor{GC._CORE_ITERS}
    UNION ALL
    SELECT 'tri', CAST(node AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(tri AS BIGINT), CAST(NULL AS BIGINT)
    FROM tril
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tag union of the salted skew join plus the non-iterative-driver
    link-graph arms (pagerank/hits/tri/core moved here from
    `text_lang_token` in round 9 — that slot had grown to 23 arms and
    ~80 s warm construction; see queries/graph_ctes.py).

    `join`: salted fact⋈dim join on a 5-value key — the worst-skew
    shape where an unsalted shuffle join puts every row on ≤5 reducers.
    The salt spreads each hot key over 32 sub-keys; the oracle is the
    plain join (salting must change execution, never results).

    `pagerank`/`hits`: the module's REAL iterative implementations —
    cached src-partitioned edges, per-round checkpointed node-sized
    rank frames, integer fixed-point arithmetic — over the synthetic
    doc_id crawl graph; the oracle replays the identical integer
    recurrences as chained CTEs, hash-exact with no rounding.

    `core`/`tri`: k-core numbers (fixed h-index rounds) and per-node
    triangle counts (degree orientation), replayed verbatim by the
    oracle."""
    from basic_data_pipeline_spark.operators import linkgraph
    from basic_data_pipeline_spark.operators.rollup import salted_join
    from pyspark.sql.window import Window as W

    e = _t(spark, sf_dir, "events")
    dim = (
        e.select("event_type")
        .distinct()
        .withColumn(
            "type_rank", F.row_number().over(W.orderBy("event_type"))
        )
    )
    nl = F.lit(None).cast("long")
    joinb = (
        salted_join(
            e.select("event_id", "event_type"), dim, "event_type"
        )
        .select(
            F.lit("join").alias("kind"),
            F.col("event_id").cast("string").alias("k1"),
            F.col("event_type").alias("k2"),
            F.col("type_rank").cast("long").alias("n1"),
            nl.alias("n2"),
        )
    )
    d = _t(spark, sf_dir, "documents")
    pg_edges = GC.synthetic_crawl_edges(d)
    nodes = d.select(F.col("doc_id").alias("node"))
    pgb = linkgraph.pagerank(
        pg_edges, nodes=nodes, iterations=GC._PG_ITERS, scale=GC._PG_SCALE
    ).select(
        F.lit("pagerank").alias("kind"),
        F.col("node").cast("string").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.col("rank").alias("n1"),
        F.col("out_deg").cast("long").alias("n2"),
    )
    hitsb = linkgraph.hits(
        pg_edges, nodes=nodes, iterations=GC._HITS_ITERS,
        keep_bits=GC._HITS_BITS,
    ).select(
        F.lit("hits").alias("kind"),
        F.col("node").cast("string").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.col("hub").alias("n1"),
        F.col("auth").alias("n2"),
    )
    coreb = linkgraph.coreness(
        pg_edges, iterations=GC._CORE_ITERS
    ).select(
        F.lit("core").alias("kind"),
        F.col("node").cast("string").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.col("core").alias("n1"),
        nl.alias("n2"),
    )
    trib = linkgraph.triangle_counts(pg_edges).select(
        F.lit("tri").alias("kind"),
        F.col("node").cast("string").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.col("triangles").alias("n1"),
        nl.alias("n2"),
    )
    return (
        joinb.unionByName(pgb)
        .unionByName(hitsb)
        .unionByName(coreb)
        .unionByName(trib)
    )


@query(
    "array_lateral_suite",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
               FROM documents)
    SELECT 'tok' AS kind, doc_id, CAST(i AS BIGINT) AS i,
           toks[CAST(i AS INT) + 1] AS s
    FROM t, UNNEST(range(0, len(toks))) AS u(i)
    WHERE doc_id < 20
    UNION ALL
    SELECT 'n_toks', doc_id, CAST(len(toks) AS BIGINT), CAST(NULL AS VARCHAR)
    FROM t
    UNION ALL
    SELECT 'n_uniq', doc_id, CAST(len(list_distinct(toks)) AS BIGINT), NULL
    FROM t
    UNION ALL
    SELECT 'has_the', doc_id, CAST(list_contains(toks, 'the') AS BIGINT), NULL
    FROM t
    UNION ALL
    SELECT 'first3', doc_id, CAST(NULL AS BIGINT),
           array_to_string(list_sort(list_distinct(toks))[1:3], '-')
    FROM t
    """,
)
def array_lateral_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function battery (§2.8: size / distinct / contains / sort /
    slice / join — all codegen'd JVM expressions, no UDFs) + lateral
    explode with ordinality (posexplode: one row per token with its
    position, the UNNEST WITH ORDINALITY shape) as one tag-unioned
    result (merges r1's scalar_array_funcs / lateral_explode_ordinal).
    Narrow row-multiplying projections, no shuffle anywhere."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    tok_rows = d.filter(F.col("doc_id") < 20).select(
        F.lit("tok").alias("kind"),
        "doc_id",
        F.posexplode(toks).alias("pos", "s"),
    ).select("kind", "doc_id", F.col("pos").cast("long").alias("i"), "s")
    stats = d.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.array_contains(toks, "the").alias("has_the"),
        F.concat_ws(
            "-", F.slice(F.array_sort(F.array_distinct(toks)), 1, 3)
        ).alias("first3_str"),
    ).selectExpr(
        "stack(4,"
        " 'n_toks', doc_id, CAST(n_toks AS BIGINT), CAST(NULL AS STRING),"
        " 'n_uniq', doc_id, CAST(n_uniq AS BIGINT), CAST(NULL AS STRING),"
        " 'has_the', doc_id, CAST(CAST(has_the AS INT) AS BIGINT), CAST(NULL AS STRING),"
        " 'first3', doc_id, CAST(NULL AS BIGINT), first3_str"
        ") AS (kind, doc_id, i, s)"
    )
    return tok_rows.unionByName(stats)


_Q6_SQL = """
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 25
"""


@query("sql_direct_q6", oracle=_Q6_SQL)
def sql_direct_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point itself (TPC-H Q6): the engine registers the
    fixture tables as views and executes the SAME ANSI string the oracle
    runs — demonstrating that a reference user's SQL works verbatim
    (spark.sql → Catalyst), not just the DataFrame API. All four filters
    reach the parquet scan as pushed predicates."""
    from basic_data_pipeline_spark.catalog import register_views

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    register_views(spark, sf_dir)
    return spark.sql(_Q6_SQL)


# NOTE: r1's `window_range_frame` moved into relational.window_analytics
# (same events/user_id window family — one shuffle serves every frame) and
# `lateral_explode_ordinal` merged into array_lateral_suite above.
