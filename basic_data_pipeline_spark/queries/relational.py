"""Relational core: projections, filters, joins, aggregations, windows,
sorts, set ops, scalar functions — SURVEY.md §2.2-§2.8.

The reference performs none of these itself (its analytics surface is
provisioned-but-empty PySpark, /root/reference/spark.sh:17-27); these
queries make the surface concrete over the driver's star schema.

Plan-shape notes for 100 TB (checked via .explain("formatted")):
- dimension joins (region/nation) broadcast explicitly — no shuffle of the
  fact side's join key ever;
- fact-fact joins (orders⋈lineitem) shuffle on the join key once and AQE
  coalesces/skew-splits;
- aggregates are partial (map-side) + final hash aggregates automatically;
- every filter here is a parquet-pushable predicate (shows in PushedFilters);
- float aggregates are rounded identically in Spark and the oracle to absorb
  accumulation-order differences between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from basic_data_pipeline_spark.catalog import load_table
from basic_data_pipeline_spark.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Pin UTC per-call: the driver owns the SparkSession and may not have
    # set it; timestamps must collect as UTC to match DuckDB's naive-UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return load_table(spark, sf_dir, name)


# Exact float-aggregate pattern: accumulate in DECIMAL(38,6) — exact and
# accumulation-order-independent — then emit DOUBLE. The oracle mirrors it
# (CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)), so both engines produce
# bit-identical doubles. Plain SUM(double) differs between engines in the
# last ulps because addition order differs; ROUND() on top of that flips at
# half-boundaries. The fixtures' money columns have ≤6 true decimal digits,
# so DECIMAL(38,6) accumulation is exact.


def _dsum(col) -> "F.Column":
    return F.sum(col.cast("decimal(38,6)")).cast("double")


def _davg(col) -> "F.Column":
    return _dsum(col) / F.count(F.lit(1))


# Fast exact aggregation for the hottest scans: decimal(38,6) accumulation
# is ~8× slower than long arithmetic (measured at the 16× probe: 23.4 s vs
# 2.8 s for q1's sums), so the flagship uses SCALED-LONG partials instead —
# same exact result, same oracle.
_EXACT_SCALE = 1_000_000  # 6 decimal digits, matching decimal(38,6)


def _exact_grouped_sums(
    df: DataFrame,
    keys: list[str],
    sums: "dict[str, F.Column]",
) -> DataFrame:
    """Exact group sums of ≤6-decimal-digit values via two-level integer
    accumulation:

    level 1 groups by (keys, spark_partition_id) and sums
    round(x·10⁶) as LONG — codegen integer adds, no BigDecimal. A
    partial cannot overflow: rows-per-partition is bounded by
    maxPartitionBytes (~4M rows) × max|x·10⁶| (~10¹¹) ≈ 4·10¹⁷ ≪ 2⁶³,
    bounded BY CONSTRUCTION regardless of total data size (a single-level
    long sum would overflow per-GROUP at ~10 TB).

    level 2 merges the (groups × partitions) partial rows — a tiny
    decimal(38,0) sum — and rescales in decimal, so the final double is
    the exact value rounded ONCE: bit-identical to the decimal(38,6)
    oracle path and independent of partitioning (integer addition is
    associative).

    Also emits `n` (count) so callers derive exact averages."""
    # (x·10⁶ + sign(x)·0.5) truncated = round-half-away-from-zero for BOTH
    # signs (double→long cast truncates toward zero, so the half-step must
    # point away from zero; a bare +0.5 would be off by 1e-6 per negative
    # row, e.g. refund/credit columns) — pure codegen double math;
    # F.round() would route every row through BigDecimal.setScale. This
    # matches the decimal(38,6) oracle, whose double→decimal conversion
    # also rounds half away from zero.
    partial = df.groupBy(
        *keys, F.spark_partition_id().alias("_p")
    ).agg(
        *[
            F.sum(
                (c * _EXACT_SCALE + F.signum(c) * 0.5).cast("long")
            ).alias(f"_s_{name}")
            for name, c in sums.items()
        ],
        F.count("*").alias("_n"),
    )
    return partial.groupBy(*keys).agg(
        *[
            (
                F.sum(F.col(f"_s_{name}").cast("decimal(38,0)"))
                / _EXACT_SCALE
            )
            .cast("double")
            .alias(name)
            for name in sums
        ],
        F.sum("_n").alias("n"),
    )


# --------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary (scan + filter + agg + sort)
# --------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)      AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
             AS sum_disc_price,
           CAST(sum(CAST((l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE)
             AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*)      AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / count(*)      AS avg_disc,
           count(*)                                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: the flagship scan→filter→groupBy→agg→sort.

    Exercises parquet predicate pushdown (l_shipdate) and the scaled-long
    exact-aggregation pattern (_exact_grouped_sums): the heavy per-row
    math is codegen integer adds — measured ~8× faster than
    decimal(38,6) accumulation at the 16× probe — while the final double
    stays bit-identical to the oracle's decimal path. Two grouped
    aggregations, both shuffles carrying only partial rows."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    sums = _exact_grouped_sums(
        li.filter(
            F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp")
        ),
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": F.col("l_quantity"),
            "sum_base_price": F.col("l_extendedprice"),
            "sum_disc_price": disc_price,
            "sum_charge": charge,
            "sum_disc": F.col("l_discount"),
        },
    )
    return sums.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        (F.col("sum_qty") / F.col("n")).alias("avg_qty"),
        (F.col("sum_base_price") / F.col("n")).alias("avg_price"),
        (F.col("sum_disc") / F.col("n")).alias("avg_disc"),
        F.col("n").alias("count_order"),
    ).orderBy("l_returnflag", "l_linestatus")


# --------------------------------------------------------------------------
# TPC-H-style multiway star joins
# --------------------------------------------------------------------------

@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    headline=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: 3-way join + agg + top-10 (TPC-H Q3 adapted).

    customer⋈orders shuffles on custkey; orders⋈lineitem on orderkey; both
    sides filtered BEFORE the join so pushdown trims the scans. The final
    ORDER BY+LIMIT becomes TakeOrderedAndProject (no full sort).
    """
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    headline=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: 6-way star join (TPC-H Q5 adapted).

    region (5 rows) and nation (25 rows) are broadcast — at 100 TB these
    stay broadcast; only the fact-fact joins shuffle. Supplier is also
    broadcast-sized at every tested SF.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


# --------------------------------------------------------------------------
# Projections / filters / predicates (P5)
# --------------------------------------------------------------------------

@query(
    "scan_filter_project",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority,
           o_totalprice * 1.07 AS price_with_tax,
           o_totalprice - 1000 AS price_less_fee,
           CAST(floor(o_totalprice) AS BIGINT) AS price_int,
           upper(o_orderpriority) AS priority_upper
    FROM orders
    WHERE o_totalprice BETWEEN 1000 AND 50000
      AND o_orderstatus IN ('O', 'F')
      AND o_orderpriority LIKE '1-%'
      AND o_orderdate IS NOT NULL
      AND NOT (o_custkey = 0)
    ORDER BY o_orderkey
    """,
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE battery (BETWEEN / IN / LIKE / IS NOT NULL / NOT — all
    parquet-pushable, visible under PushedFilters) feeding the generic
    computed-SELECT-list surface (arithmetic, casts, renames) in one
    codegen'd stage. Merges r1's `filter_predicates` + `projection_compute`
    (same §2 line) so the whole P5 surface holds one CORRECTNESS row.

    o_totalprice has ≤2 true decimal digits, so the arithmetic is exact
    IEEE double on both engines (no accumulation — safe without the
    decimal pattern, which only matters for multi-row SUMs)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_totalprice").between(1000, 50000))
        .filter(F.col("o_orderstatus").isin("O", "F"))
        .filter(F.col("o_orderpriority").like("1-%"))
        .filter(F.col("o_orderdate").isNotNull())
        .filter(~(F.col("o_custkey") == 0))
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderpriority",
            (F.col("o_totalprice") * 1.07).alias("price_with_tax"),
            (F.col("o_totalprice") - 1000).alias("price_less_fee"),
            # floor() explicitly: Spark's double→bigint CAST truncates while
            # DuckDB's rounds — floor is identical on both engines.
            F.floor("o_totalprice").alias("price_int"),
            F.upper("o_orderpriority").alias("priority_upper"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Join family (§2.3)
# --------------------------------------------------------------------------

@query(
    "join_flavors",
    oracle="""
    SELECT 'inner' AS flavor, c_custkey, o_orderkey, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 100000
    UNION ALL
    SELECT 'left', c_custkey, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 400000
    UNION ALL
    SELECT 'full', c_custkey, o_orderkey, o_totalprice
    FROM (SELECT * FROM customer WHERE c_acctbal > 9000) bc
    FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) bo
      ON c_custkey = o_custkey
    ORDER BY flavor, c_custkey, o_orderkey
    """,
)
def join_flavors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner / left-outer / full-outer equi joins of orders⋈customer as one
    tag-unioned result (merges r1's join_inner / join_left_outer /
    join_full_outer — three §2 lines, one CORRECTNESS row each branch).
    The left branch keeps its price predicate in the ON clause so
    non-matching customers survive with nulls; the full branch filters
    both sides so nulls appear on both wings. Catalyst picks broadcast at
    test SF, sort-merge via AQE at scale — same plan per branch as the
    unmerged originals (union is a no-shuffle bag concat on top)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    inner = (
        o.filter(F.col("o_totalprice") > 100000)
        .join(c, o.o_custkey == c.c_custkey, "inner")
        .select(
            F.lit("inner").alias("flavor"),
            "c_custkey",
            "o_orderkey",
            "o_totalprice",
        )
    )
    left = c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 400000), "left"
    ).select(
        F.lit("left").alias("flavor"), "c_custkey", "o_orderkey", "o_totalprice"
    )
    big_c = c.filter(F.col("c_acctbal") > 9000)
    big_o = o.filter(F.col("o_totalprice") > 400000)
    full = big_c.join(big_o, big_c.c_custkey == big_o.o_custkey, "full_outer").select(
        F.lit("full").alias("flavor"), "c_custkey", "o_orderkey", "o_totalprice"
    )
    return inner.unionByName(left).unionByName(full).orderBy(
        "flavor", "c_custkey", "o_orderkey"
    )


@query(
    "join_semi_anti",
    oracle="""
    SELECT 'semi' AS kind, c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    UNION ALL
    SELECT 'anti', c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 250000)
    ORDER BY kind, c_custkey
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi (EXISTS) + left anti (NOT EXISTS) in one tag-unioned
    result (merges r1's join_semi / join_anti). The anti branch is the
    delete-apply shape of the reference's `ALTER TABLE … DELETE WHERE pk`
    (consumer_to_file.py:237-246) re-expressed relationally (SURVEY.md
    S10); both broadcast the filtered orders side when small."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    semi = c.join(
        o.filter(F.col("o_totalprice") > 400000),
        c.c_custkey == o.o_custkey,
        "left_semi",
    ).select(F.lit("semi").alias("kind"), "c_custkey", "c_name")
    anti = c.join(
        o.filter(F.col("o_totalprice") > 250000),
        c.c_custkey == o.o_custkey,
        "left_anti",
    ).select(F.lit("anti").alias("kind"), "c_custkey", "c_name")
    return semi.unionByName(anti).orderBy("kind", "c_custkey")


@query(
    "join_broadcast_star",
    oracle="""
    SELECT r_name, n_name, count(*) AS n_suppliers,
           CAST(sum(CAST(s_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
)
def join_broadcast_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension joins with explicit broadcast() — zero shuffle of the fact
    side for the join itself (only the final groupBy shuffles)."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            _dsum(F.col("s_acctbal")).alias("total_acctbal"),
        )
        .orderBy("r_name", "n_name")
    )


@query(
    "join_range_cross",
    oracle="""
    SELECT 'theta' AS kind, p_partkey AS a, CAST(p_size AS BIGINT) AS b
    FROM part pa
    WHERE EXISTS (
      SELECT 1 FROM part pb
      WHERE pb.p_brand = pa.p_brand AND pb.p_partkey <> pa.p_partkey
        AND pb.p_retailprice BETWEEN pa.p_retailprice - 1 AND pa.p_retailprice + 1
    )
    UNION ALL
    SELECT 'cross', ra.r_regionkey, rb.r_regionkey
    FROM region ra CROSS JOIN region rb
    WHERE ra.r_regionkey < rb.r_regionkey
    UNION ALL
    SELECT 'binned', e.event_id, o.o_orderkey
    FROM (SELECT event_id, value FROM events WHERE event_id % 5 = 0) e
    JOIN (SELECT o_orderkey, o_totalprice % 80 AS lo,
                 o_totalprice % 80 + o_orderkey % 7 AS hi
          FROM orders WHERE o_orderkey % 100 = 0) o
      ON e.value BETWEEN o.lo AND o.hi
    UNION ALL
    SELECT 'fuzzy', ca.c_custkey, cb.c_custkey
    FROM customer ca JOIN customer cb
      ON ca.c_custkey < cb.c_custkey
    WHERE ca.c_custkey < 150 AND cb.c_custkey < 150
      AND levenshtein(lower(trim(ca.c_name)), lower(trim(cb.c_name))) <= 1
    ORDER BY kind, a, b
    """,
)
def join_range_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/theta self-join + bounded cross join + PURE range join as
    one tag-unioned result (merges r1's join_range_theta /
    join_cross_bounded; r6 adds the no-equi-key case).

    Theta branch: parts with a same-brand near-priced sibling — blocked on
    p_brand (equi component) so Catalyst plans a hash join with the range
    as a post-filter, NOT a nested-loop cross product; the blocking key is
    what keeps this viable at 100 TB. Cross branch: tiny dimension ×
    itself, upper triangle — the only sanctioned unblocked cross join
    shape (broadcast-bounded). Binned branch: point-in-interval with NO
    equi component — the shape Spark would plan as a nested-loop — via
    operators/rangejoin.py binned_range_join (bin replication → equi-join
    on bin → residual BETWEEN; plan-asserted equi-join in
    tests/test_rangejoin.py); the oracle states the same join as a bare
    BETWEEN, which DuckDB's IEJoin handles natively. Fuzzy branch (r6):
    edit-distance-1 self-join on customer names via operators/entity.py
    prefix-filtered q-gram blocking (no cartesian, plan-asserted in
    test_entity.py) — the oracle states the naive quadratic predicate
    (levenshtein ≤ 1 over the cross product), so a hash match proves the
    blocking loses NOTHING."""
    from basic_data_pipeline_spark.operators.rangejoin import binned_range_join
    a = _t(spark, sf_dir, "part").alias("a")
    b = _t(spark, sf_dir, "part").alias("b")
    cond = (
        (F.col("b.p_brand") == F.col("a.p_brand"))
        & (F.col("b.p_partkey") != F.col("a.p_partkey"))
        & (F.col("b.p_retailprice") >= F.col("a.p_retailprice") - 1)
        & (F.col("b.p_retailprice") <= F.col("a.p_retailprice") + 1)
    )
    theta = (
        a.join(b, cond, "left_semi")
        .select(
            F.lit("theta").alias("kind"),
            F.col("p_partkey").alias("a"),
            F.col("p_size").cast("bigint").alias("b"),
        )
    )
    ra = _t(spark, sf_dir, "region").alias("ra")
    rb = _t(spark, sf_dir, "region").alias("rb")
    cross = (
        ra.crossJoin(rb)
        .filter(F.col("ra.r_regionkey") < F.col("rb.r_regionkey"))
        .select(
            F.lit("cross").alias("kind"),
            F.col("ra.r_regionkey").alias("a"),
            F.col("rb.r_regionkey").alias("b"),
        )
    )
    pts = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 5 == 0)
        .select(F.col("event_id").alias("pid"), F.col("value").alias("p"))
    )
    iv = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            F.col("o_orderkey").alias("iid"),
            (F.col("o_totalprice") % 80).alias("lo"),
            (F.col("o_totalprice") % 80 + F.col("o_orderkey") % 7).alias("hi"),
        )
    )
    binned = binned_range_join(pts, iv, "p", "lo", "hi", bin_width=8.0).select(
        F.lit("binned").alias("kind"),
        F.col("pid").alias("a"),
        F.col("iid").alias("b"),
    )
    from basic_data_pipeline_spark.operators.entity import fuzzy_pairs

    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 150)
        .select(
            F.col("c_custkey").alias("cid"), F.col("c_name").alias("cname")
        )
    )
    fuzzy = fuzzy_pairs(cust, "cid", "cname", max_edit=1).select(
        F.lit("fuzzy").alias("kind"),
        F.col("id_a").alias("a"),
        F.col("id_b").alias("b"),
    )
    return (
        theta.unionByName(cross)
        .unionByName(binned)
        .unionByName(fuzzy)
        .orderBy("kind", "a", "b")
    )


@query(
    "join_asof_latest_event",
    oracle="""
    WITH ranked AS (
      SELECT o_orderkey, o_orderdate, e.event_id, e.ts,
             row_number() OVER (PARTITION BY o_orderkey ORDER BY e.ts DESC, e.event_id DESC) AS rn
      FROM orders
      JOIN events e ON e.user_id = o_custkey % 20
        AND e.ts <= o_orderdate + INTERVAL 9500 DAY
      WHERE o_orderkey < 200
    )
    SELECT o_orderkey, o_orderdate, event_id AS last_event_id,
           CAST(ts AS TIMESTAMP) AS last_event_ts
    FROM ranked WHERE rn = 1
    ORDER BY o_orderkey
    """,
)
def join_asof_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (latest event at-or-before a time horizon per key).

    Spark SQL has no native ASOF; the idiomatic composition is
    equi-join on the key + range predicate + row_number()=1 to keep the
    latest match. The equi component (user_id) is the shuffle key.

    SCALE NOTE: this form materializes every (left × in-range right) pair
    per key before the rn=1 prune, so a hot key with many in-range events
    explodes the join output. At scale — or with skewed keys — use the
    linear union+window form in `operators/asof.py` (`asof_join`,
    registered as the `join_asof_union_window` query): one sort per
    key, no pair materialization, same semantics.
    """
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    e = _t(spark, sf_dir, "events")
    joined = o.join(
        e,
        (e.user_id == o.o_custkey % 20)
        & (e.ts <= F.col("o_orderdate") + F.expr("INTERVAL 9500 DAYS")),
    )
    w = W.partitionBy("o_orderkey").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderkey",
            "o_orderdate",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_event_ts"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Aggregations (§2.4)
# --------------------------------------------------------------------------

@query(
    "agg_core",
    oracle="""
    SELECT l_returnflag,
           count(*)                   AS n_items,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avg_price,
           min(l_extendedprice)       AS min_price,
           max(l_extendedprice)       AS max_price,
           count(DISTINCT l_suppkey)  AS n_suppliers,
           count(DISTINCT l_partkey)  AS n_parts
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count/sum/avg/min/max + exact countDistinct in one groupBy (merges
    r1's agg_basic / agg_count_distinct — two §2 lines, one row). Spark
    plans the distincts as an expand + two-phase agg; the plain aggregates
    stay partial (map-side) + final."""
    li = _t(spark, sf_dir, "lineitem")
    # The two DISTINCT aggregates run as their OWN passes, joined back on
    # the group key (r11): mixed into the plain aggregation they trigger
    # Catalyst's expand rewrite — every input row is tripled through the
    # aggregate (one replica per distinct column + one for the plain
    # aggs) — measured 1.6 s vs 1.15 s split at sf0.1; the joins are
    # group-cardinality-sized broadcasts. Same split as
    # agg_approx_distinct (the r11 board's first catch).
    # PRECONDITION (r11 ADVICE): the inner joins below assume the group
    # key is NON-NULL (true for TPC-H l_returnflag). A NULL-keyed group
    # would survive each single groupBy but be dropped by the inner
    # equi-join — copies of this split pattern onto a nullable key must
    # join with eqNullSafe (<=>) instead.
    plain = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        _dsum(F.col("l_extendedprice")).alias("sum_price"),
        _davg(F.col("l_extendedprice")).alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )
    supp = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers")
    )
    part = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts")
    )
    return (
        plain.join(F.broadcast(supp), "l_returnflag")
        .join(F.broadcast(part), "l_returnflag")
        .select(
            "l_returnflag", "n_items", "sum_price", "avg_price",
            "min_price", "max_price", "n_suppliers", "n_parts",
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           CAST(abs(approx_count_distinct(l_partkey)
                    - count(DISTINCT l_partkey))
                <= 0.05 * count(DISTINCT l_partkey) AS INTEGER)
               AS approx_within_5pct,
           CAST(abs(approx_quantile(l_extendedprice, 0.5)
                    - quantile_cont(l_extendedprice, 0.5))
                <= 0.02 * (max(l_extendedprice) - min(l_extendedprice))
                AS INTEGER) AS p50_within_2pct_range
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates (HyperLogLog distinct + quantile sketch),
    oracle-checked by BOUND rather than by value: Spark's HLL++/Greenwald-
    Khanna and DuckDB's HLL/t-digest produce different estimates (and
    even the EXACT interpolated median can differ in the last float ulp),
    so the comparable surface is (exact count, did-my-own-sketch land
    within tolerance of my-own-exact). Each engine asserts its own
    sketches; the hash compare then enforces the exact counts and both
    tolerance flags. A pytest additionally pins Spark's HLL estimate
    within 5% of exact."""
    li = _t(spark, sf_dir, "lineitem")
    # THREE aggregations joined on the 4-row group key, NOT one: mixing a
    # DISTINCT aggregate with non-distinct ones forces Catalyst's expand
    # rewrite through one object-hash aggregate carrying the percentile
    # map + HLL + digest buffers together — measured 15-19 s at sf0.1
    # where each component alone runs ~1 s (r11 board's first catch).
    # The r11 optimization round found the residual: even countDistinct +
    # approx_count_distinct TOGETHER still expand-rewrite to 3.9 s where
    # each alone is 0.6/0.9 s — so the exact distinct, the HLL sketch,
    # and the percentile family each get their own codegen pass. The
    # joins are group-cardinality-sized (broadcast).
    distinct_side = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    hll_side = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("_approx"),
    )
    plain_side = li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias(
            "_p50_approx"
        ),
        F.max("l_extendedprice").alias("_max"),
        F.min("l_extendedprice").alias("_min"),
        F.count("*").alias("_n"),
    )
    # EXACT median as a sort-based rank pick, not percentile()'s
    # OpenHashMap aggregate (r12 — the map aggregate carried every
    # distinct value+count through an ObjectHashAggregate, ~1.3 s of
    # this slot's 2.2 s exec at sf0.1): pre-aggregate counts per
    # (group, value) — partial/map-side-friendly, guide §2.3 — then one
    # window over the DISTINCT values per group computes cumulative
    # counts, and the rows covering the two middle ranks are averaged.
    # percentile(x, 0.5) interpolates as 0.5·x[lo] + 0.5·x[hi] with
    # lo = (n−1) div 2 and hi = n div 2 (0-based), which is exactly
    # (x[lo] + x[hi]) / 2 — when a single value covers both ranks the
    # weight-2 sum divides back to that value. Both formulations
    # funnel each group's order statistic through one task; this one
    # moves (value, count) pairs instead of a per-task value map.
    vc = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count("*").alias("_c")
    )
    wcum = W.partitionBy("l_returnflag").orderBy("l_extendedprice")
    cum = vc.select(
        "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("_v"),
        F.sum("_c").over(wcum).alias("_hi_rank"),
        (F.sum("_c").over(wcum) - F.col("_c")).alias("_lo_rank_excl"),
    )
    n_by_grp = F.broadcast(plain_side.select("l_returnflag", "_n"))
    med_side = (
        cum.join(n_by_grp, "l_returnflag")
        .select(
            "l_returnflag",
            "_v",
            (
                (
                    (F.expr("(_n - 1) div 2") + 1 > F.col("_lo_rank_excl"))
                    & (F.expr("(_n - 1) div 2") + 1 <= F.col("_hi_rank"))
                ).cast("int")
                + (
                    (F.expr("_n div 2") + 1 > F.col("_lo_rank_excl"))
                    & (F.expr("_n div 2") + 1 <= F.col("_hi_rank"))
                ).cast("int")
            ).alias("_w"),
        )
        .where(F.col("_w") > 0)
        .groupBy("l_returnflag")
        .agg((F.sum(F.col("_v") * F.col("_w")) / 2).alias("_p50_exact"))
    )
    agg = (
        distinct_side.join(F.broadcast(hll_side), "l_returnflag")
        .join(F.broadcast(plain_side), "l_returnflag")
        .join(F.broadcast(med_side), "l_returnflag")
    )
    return (
        agg.select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("_approx") - F.col("exact_parts"))
                <= 0.05 * F.col("exact_parts")
            )
            .cast("int")
            .alias("approx_within_5pct"),
            (
                F.abs(F.col("_p50_approx") - F.col("_p50_exact"))
                <= 0.02 * (F.col("_max") - F.col("_min"))
            )
            .cast("int")
            .alias("p50_within_2pct_range"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list → array, sorted for determinism across engines.

    Emitted as a comma-joined STRING (not array<string>): the driver's
    canonicalizer hashes cells via pandas and dies on unhashable list
    cells, so the deterministic serialization carries the same evidence
    (collect_list + array_sort) in a hashable column.
    """
    n = _t(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias(
                "nations"
            )
        )
        .orderBy("n_regionkey")
    )


@query(
    "agg_multilevel",
    oracle="""
    SELECT 'rollup' AS src, l_returnflag AS k1, l_linestatus AS k2,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS val
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube', o_orderstatus, o_orderpriority, count(*),
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    UNION ALL
    SELECT 'gsets', c_mktsegment, CAST(c_nationkey AS VARCHAR), count(*),
           CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    ORDER BY src, k1 NULLS FIRST, k2 NULLS FIRST
    """,
)
def agg_multilevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP + CUBE + GROUPING SETS as one tag-unioned result (merges
    r1's agg_rollup / agg_cube / agg_grouping_sets — one §2 line). The
    rollup and cube branches use the DataFrame API, the grouping-sets
    branch the SQL surface — same Expand-based Catalyst plan family.
    Keys are cast to string so the three branches share one schema."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    roll = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), _dsum(F.col("l_quantity")).alias("val"))
        .select(
            F.lit("rollup").alias("src"),
            F.col("l_returnflag").alias("k1"),
            F.col("l_linestatus").alias("k2"),
            "n",
            "val",
        )
    )
    cube = (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), _dsum(F.col("o_totalprice")).alias("val"))
        .select(
            F.lit("cube").alias("src"),
            F.col("o_orderstatus").alias("k1"),
            F.col("o_orderpriority").alias("k2"),
            "n",
            "val",
        )
    )
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    gsets = spark.sql(
        """
        SELECT 'gsets' AS src, c_mktsegment AS k1,
               CAST(c_nationkey AS STRING) AS k2, count(*) AS n,
               CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS val
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )
    return (
        roll.unionByName(cube)
        .unionByName(gsets)
        .orderBy("src", F.col("k1").asc_nulls_first(), F.col("k2").asc_nulls_first())
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 15
    ORDER BY o_custkey
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("spend"),
        )
        .filter(F.col("n_orders") >= 15)
        .orderBy("o_custkey")
    )


@query(
    "topk_per_group",
    oracle="""
    WITH ranked AS (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    )
    SELECT c_mktsegment, c_custkey, c_acctbal, rn
    FROM ranked WHERE rn <= 3
    ORDER BY c_mktsegment, rn
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group: the canonical window + row_number()<=K. At scale,
    Spark pushes a per-partition local top-K before the shuffle."""
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rn")
        .orderBy("c_mktsegment", "rn")
    )


# --------------------------------------------------------------------------
# Window functions (§2.5)
# --------------------------------------------------------------------------

@query(
    "window_rank_family",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal,
           row_number()  OVER w AS rn,
           rank()        OVER w AS rnk,
           dense_rank()  OVER w AS drnk
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    ORDER BY s_nationkey, rn
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank over one window definition."""
    s = _t(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), "s_suppkey")
    return (
        s.select(
            "s_suppkey",
            "s_nationkey",
            "s_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .orderBy("s_nationkey", "rn")
    )


@query(
    "window_analytics",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           lag(event_id)  OVER w AS prev_event,
           lead(event_id) OVER w AS next_event,
           epoch_us(CAST(ts AS TIMESTAMP)) // 1000000
             - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP)) // 1000000 AS gap_seconds,
           CAST(sum(CAST(value AS DECIMAL(38,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_n,
           first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type,
           last_value(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type,
           CAST(sum(CAST(value AS DECIMAL(38,6)))
                OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS hour_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    headline=True,
)
def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full analytic-window battery per event row (merges r1's
    window_lag_lead / window_running_total / window_first_last /
    window_range_frame — four §2 sub-items, one row each branch):
    lag/lead + inter-event gap (the sessionization building block),
    running totals over an explicit ROWS frame, first/last over the
    full-partition frame, and the event-time RANGE frame (rolling 1-hour
    sum bounded by the ORDER-BY value, not row counts — ANSI peer
    semantics identical on both engines).

    All frames share the user_id partition, so Spark plans ONE shuffle +
    ONE sort feeding every window function — merging is strictly cheaper
    than the four standalone queries. No global ORDER BY on the output:
    sorting a full result set is a scale anti-pattern (a second
    range-partition shuffle measured at ~70% of this query's warm
    runtime) and the correctness gate compares order-insensitively."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        e.select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.lag("event_id").over(w).alias("prev_event"),
            F.lead("event_id").over(w).alias("next_event"),
            (
                F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
            ).alias("gap_seconds"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .over(wrun)
            .cast("double")
            .alias("running_value"),
            F.count("*").over(wrun).alias("running_n"),
            F.first("event_type").over(wfull).alias("first_type"),
            F.last("event_type").over(wfull).alias("last_type"),
            F.expr(
                """CAST(sum(CAST(value AS DECIMAL(38,6)))
                   OVER (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                   AS DOUBLE)"""
            ).alias("hour_sum"),
        )
        .drop("value")
    )


# --------------------------------------------------------------------------
# Sorts / limits / top-k (§2.6)
# --------------------------------------------------------------------------

@query(
    "order_pick",
    oracle="""
    SELECT * FROM (
      SELECT 'sort50' AS kind, o_orderkey, o_orderpriority, o_totalprice
      FROM orders
      ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey
      LIMIT 50)
    UNION ALL
    SELECT * FROM (
      SELECT 'random_pick', o_orderkey, o_orderpriority, o_totalprice
      FROM orders
      ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
      LIMIT 1)
    ORDER BY kind, o_orderkey
    """,
)
def order_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort + limit (→ TakeOrderedAndProject, no global sort)
    unioned with the reference's `ORDER BY RAND() LIMIT 1` random-row pick
    (data_inserter.py:44,57) made deterministic — order by a hash of the
    key so both engines agree; same top-1 plan shape as rand(). Merges
    r1's sort_multi_limit / deterministic_random_pick."""
    o = _t(spark, sf_dir, "orders")
    sort50 = (
        o.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(
            F.asc("o_orderpriority"), F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        .limit(50)
        .select(F.lit("sort50").alias("kind"), "*")
    )
    pick = (
        o.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(F.md5(F.col("o_orderkey").cast("string")), "o_orderkey")
        .limit(1)
        .select(F.lit("random_pick").alias("kind"), "*")
    )
    return sort50.unionByName(pick).orderBy("kind", "o_orderkey")


# --------------------------------------------------------------------------
# Set operations (§2.7)
# --------------------------------------------------------------------------

@query(
    "set_ops_suite",
    oracle="""
    SELECT 'union_all' AS op, CAST(c_nationkey AS VARCHAR) AS k
    FROM customer WHERE c_acctbal > 9900
    UNION ALL
    SELECT 'union_all', CAST(s_nationkey AS VARCHAR)
    FROM supplier WHERE s_acctbal > 9000
    UNION ALL
    SELECT 'union_distinct', CAST(nationkey AS VARCHAR) FROM (
      SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900
      UNION
      SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000)
    UNION ALL
    SELECT 'intersect', CAST(nationkey AS VARCHAR) FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000)
    UNION ALL
    SELECT 'except', CAST(nationkey AS VARCHAR) FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000)
    UNION ALL
    SELECT 'distinct', l_returnflag || '/' || l_linestatus
    FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)
    ORDER BY op, k
    """,
)
def set_ops_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full set-operation family as one tag-unioned result (merges
    r1's set_union_all / set_union_distinct / set_intersect / set_except /
    distinct_rows — one §2 line): UNION ALL (bag concat, no shuffle),
    UNION DISTINCT (hash-agg dedup), INTERSECT, EXCEPT (Spark `subtract`
    = EXCEPT DISTINCT), and DISTINCT on a projection. Keys cast to string
    for the shared schema."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    c_hi = c.filter(F.col("c_acctbal") > 9900).select(
        F.col("c_nationkey").alias("nationkey")
    )
    s_hi = s.filter(F.col("s_acctbal") > 9000).select(
        F.col("s_nationkey").alias("nationkey")
    )
    c_all = c.select(F.col("c_nationkey").alias("nationkey"))

    def tag(df: DataFrame, op: str) -> DataFrame:
        return df.select(
            F.lit(op).alias("op"), F.col("nationkey").cast("string").alias("k")
        )

    union_all = tag(c_hi.unionAll(s_hi), "union_all")
    union_distinct = tag(c_hi.union(s_hi).distinct(), "union_distinct")
    intersect = tag(
        c_all.intersect(
            s.filter(F.col("s_acctbal") > 5000).select(
                F.col("s_nationkey").alias("nationkey")
            )
        ),
        "intersect",
    )
    except_ = tag(
        c_all.subtract(
            s.filter(F.col("s_acctbal") > 8000).select(
                F.col("s_nationkey").alias("nationkey")
            )
        ),
        "except",
    )
    distinct = (
        li.select("l_returnflag", "l_linestatus")
        .distinct()
        .select(
            F.lit("distinct").alias("op"),
            F.concat_ws("/", "l_returnflag", "l_linestatus").alias("k"),
        )
    )
    return (
        union_all.unionByName(union_distinct)
        .unionByName(intersect)
        .unionByName(except_)
        .unionByName(distinct)
        .orderBy("op", "k")
    )


# --------------------------------------------------------------------------
# Subqueries
# --------------------------------------------------------------------------

_SUBQUERY_SUITE_SQL = """
    SELECT 'scalar' AS q, c_custkey AS k
    FROM customer
    WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                              / count(*) * 1.8
                       FROM customer)
    UNION ALL
    SELECT 'in', o_orderkey
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'MACHINERY')
      AND o_totalprice > 300000
    UNION ALL
    SELECT 'exists', s_suppkey
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem WHERE l_suppkey = s.s_suppkey AND l_quantity >= 49
    )
    ORDER BY q, k
"""


@query("subquery_suite", oracle=_SUBQUERY_SUITE_SQL)
def subquery_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The subquery family via the SQL surface, tag-unioned (merges r1's
    scalar_subquery / in_subquery / correlated_exists — one §2 line):
    uncorrelated scalar subquery in WHERE (threshold computed with the
    exact decimal-avg pattern so the boundary is bit-identical in both
    engines), IN (→ left semi join), and correlated EXISTS (decorrelated
    by Catalyst into a semi join). The engine executes the SAME ANSI
    string the oracle runs."""
    for name in ("customer", "orders", "supplier", "lineitem"):
        _t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SUBQUERY_SUITE_SQL)


# --------------------------------------------------------------------------
# Scalar functions (§2.8) + pivot
# --------------------------------------------------------------------------

@query(
    "scalar_string_date_case",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderpriority)                  AS prio_upper,
           lower(o_orderpriority)                  AS prio_lower,
           length(o_orderpriority)                 AS prio_len,
           substr(o_orderpriority, 1, 3)           AS prio_prefix,
           concat(o_orderstatus, ':', o_orderpriority) AS status_prio,
           replace(o_orderpriority, '-', '_')      AS prio_snake,
           trim(o_orderpriority)                   AS prio_trim,
           CASE WHEN o_orderpriority LIKE '%URGENT%' THEN 1 ELSE 0 END AS is_urgent,
           CAST(year(o_orderdate)       AS INT) AS order_year,
           CAST(month(o_orderdate)      AS INT) AS order_month,
           CAST(dayofmonth(o_orderdate) AS INT) AS order_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT)
             AS days_since_epoch_start,
           CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm
    FROM orders WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
)
def scalar_string_date_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String + date/time + CASE/null scalar batteries as ONE wide
    codegen'd projection over orders (merges r1's scalar_string_funcs /
    scalar_date_funcs / scalar_case_when — one §2 line): upper/lower/
    length/substr/concat/replace/trim/LIKE, year/month/day extract,
    date_trunc, interval add, datediff, CASE banding, coalesce/nullif."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.lower("o_orderpriority").alias("prio_lower"),
        F.length("o_orderpriority").cast("bigint").alias("prio_len"),
        F.substring("o_orderpriority", 1, 3).alias("prio_prefix"),
        F.concat_ws(":", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.regexp_replace("o_orderpriority", "-", "_").alias("prio_snake"),
        F.trim("o_orderpriority").alias("prio_trim"),
        F.when(F.col("o_orderpriority").like("%URGENT%"), 1)
        .otherwise(0)
        .alias("is_urgent"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp")
        ).alias("days_since_epoch_start"),
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")
        ).alias("status_norm"),
    ).orderBy("o_orderkey")


@query(
    "scalar_math_json",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 30000)              AS abs_diff,
           CAST(ceil(l_quantity / 7) AS BIGINT)      AS qty_ceil,
           CAST(floor(l_quantity / 7) AS BIGINT)     AS qty_floor,
           sqrt(l_extendedprice)                     AS price_sqrt,
           round(ln(l_extendedprice + 1), 6)         AS price_ln,
           l_discount * l_discount                   AS disc_sq,
           CAST(l_quantity AS BIGINT) % 5            AS qty_mod,
           CAST(json_extract_string(e.props, '$.k') AS BIGINT) AS prop_k,
           CAST(len(json_keys(e.props)) AS INT)      AS n_keys,
           array_to_string(list_sort(json_keys(e.props)), ',') AS keys_csv,
           json_extract_string(e.props, '$.k')       AS k_str,
           json_extract(e.props, '$.k') IS NOT NULL  AS has_k
    FROM lineitem
    JOIN events e ON e.event_id = l_orderkey
    WHERE l_orderkey <= 60
    ORDER BY l_orderkey, l_linenumber
    """,
)
def scalar_math_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery (abs/ceil/floor/sqrt/ln/pow/mod) + JSON path
    extraction + MAP functions in one projection (merges r1's
    scalar_math_funcs / scalar_json_extract and covers §2.8 F12's map
    surface). The JSON column rides in from events via an equi-join
    (props stays a string at rest — the same json→String decision as the
    reference, consumer_to_file.py:48-49 — parsed on demand): one branch
    uses get_json_object (path extraction), the other parses into a real
    map<string,string> and exercises map_keys / element_at /
    map_contains_key — the map surface DuckDB mirrors with json_keys."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 60)
    e = _t(spark, sf_dir, "events").select("event_id", "props")
    props_map = F.from_json("props", "map<string,string>")
    return (
        li.join(F.broadcast(e), e.event_id == li.l_orderkey)
        .withColumn("_pm", props_map)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.abs(F.col("l_extendedprice") - 30000).alias("abs_diff"),
            F.ceil(F.col("l_quantity") / 7).alias("qty_ceil"),
            F.floor(F.col("l_quantity") / 7).alias("qty_floor"),
            F.sqrt("l_extendedprice").alias("price_sqrt"),
            F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
            (F.col("l_discount") * F.col("l_discount")).alias("disc_sq"),
            (F.col("l_quantity").cast("bigint") % 5).alias("qty_mod"),
            F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
            F.size(F.map_keys(F.col("_pm"))).alias("n_keys"),
            F.concat_ws(",", F.array_sort(F.map_keys(F.col("_pm")))).alias(
                "keys_csv"
            ),
            F.element_at(F.col("_pm"), "k").alias("k_str"),
            F.map_contains_key(F.col("_pm"), "k").alias("has_k"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "pivot_unpivot",
    oracle="""
    SELECT o_orderpriority, 'O' AS status,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT o_orderpriority, 'F', count(*) FILTER (WHERE o_orderstatus = 'F')
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT o_orderpriority, 'P', count(*) FILTER (WHERE o_orderstatus = 'P')
    FROM orders GROUP BY o_orderpriority
    ORDER BY o_orderpriority, status
    """,
)
def pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot → unpivot round-trip in one plan (merges r1's
    pivot_status_by_priority / unpivot_stack): fixed-value pivot (single
    pass, no distinct-values pre-query) producing wide per-status counts,
    then stack() unpivots the wide result back to long — including the
    zero cells the pivot materialized. Exercises both reshape directions;
    the oracle reproduces the long form with FILTER aggregates."""
    o = _t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce(F.col("O"), F.lit(0)).alias("status_O"),
            F.coalesce(F.col("F"), F.lit(0)).alias("status_F"),
            F.coalesce(F.col("P"), F.lit(0)).alias("status_P"),
        )
    )
    return (
        piv.selectExpr(
            "o_orderpriority",
            "stack(3, 'O', status_O, 'F', status_F, 'P', status_P)"
            " AS (status, n)",
        )
        .orderBy("o_orderpriority", "status")
    )
