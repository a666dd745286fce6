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

    Exercises parquet predicate pushdown (l_shipdate), partial+final hash
    aggregation, and TakeOrdered sort. Single shuffle on the group keys.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            _davg(F.col("l_quantity")).alias("avg_qty"),
            _davg(F.col("l_extendedprice")).alias("avg_price"),
            _davg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


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
    "filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_totalprice BETWEEN 1000 AND 50000
      AND o_orderstatus IN ('O', 'F')
      AND o_orderpriority LIKE '1-%'
      AND o_orderdate IS NOT NULL
      AND NOT (o_custkey = 0)
    ORDER BY o_orderkey
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE battery: BETWEEN / IN / LIKE / IS NOT NULL / NOT — all
    parquet-pushable predicates (PushedFilters in the scan node)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_totalprice").between(1000, 50000))
        .filter(F.col("o_orderstatus").isin("O", "F"))
        .filter(F.col("o_orderpriority").like("1-%"))
        .filter(F.col("o_orderdate").isNotNull())
        .filter(~(F.col("o_custkey") == 0))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


@query(
    "projection_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS gross_price,
           CAST(l_quantity AS BIGINT) AS qty_int,
           upper(l_returnflag) AS flag_upper
    FROM lineitem
    WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber
    """,
)
def projection_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed/renamed columns + casts: the generic SELECT-list surface."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("gross_price"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.upper("l_returnflag").alias("flag_upper"),
    ).orderBy("l_orderkey", "l_linenumber")


# --------------------------------------------------------------------------
# Join family (§2.3)
# --------------------------------------------------------------------------

@query(
    "join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 100000
    ORDER BY o_orderkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders⋈customer; Catalyst picks the strategy
    (broadcast at test SF, sort-merge at scale via AQE)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
        .orderBy("o_orderkey")
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 400000
    ORDER BY c_custkey, o_orderkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a join-side predicate (kept in the ON clause so
    non-matching customers survive with nulls)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(
            o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 400000), "left"
        )
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .orderBy("c_custkey", "o_orderkey")
    )


@query(
    "join_full_outer",
    oracle="""
    WITH big_cust AS (SELECT * FROM customer WHERE c_acctbal > 9000),
         big_ord  AS (SELECT * FROM orders   WHERE o_totalprice > 400000)
    SELECT c_custkey, c_acctbal, o_orderkey, o_totalprice
    FROM big_cust FULL OUTER JOIN big_ord ON c_custkey = o_custkey
    ORDER BY c_custkey, o_orderkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two filtered sides — nulls on both wings."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "full_outer")
        .select("c_custkey", "c_acctbal", "o_orderkey", "o_totalprice")
        .orderBy("c_custkey", "o_orderkey")
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    ORDER BY c_custkey
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join = EXISTS. Also the shape of the reference's
    'does this key exist in the sink' check."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 250000)
    ORDER BY c_custkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join = NOT EXISTS — the delete-apply shape of the
    reference's `ALTER TABLE … DELETE WHERE pk` (consumer_to_file.py:237-246)
    re-expressed relationally (SURVEY.md S10)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


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
    "join_range_theta",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice, p_size
    FROM part a
    WHERE EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_brand = a.p_brand AND b.p_partkey <> a.p_partkey
        AND b.p_retailprice BETWEEN a.p_retailprice - 1 AND a.p_retailprice + 1
    )
    ORDER BY p_partkey
    """,
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/theta self-join: parts with a same-brand near-priced sibling.

    Blocked on p_brand (equi component) so Catalyst plans a hash join with
    the range as a post-filter, NOT a nested-loop cross product — the
    blocking key is what keeps this viable at 100 TB.
    """
    a = _t(spark, sf_dir, "part").alias("a")
    b = _t(spark, sf_dir, "part").alias("b")
    cond = (
        (F.col("b.p_brand") == F.col("a.p_brand"))
        & (F.col("b.p_partkey") != F.col("a.p_partkey"))
        & (F.col("b.p_retailprice") >= F.col("a.p_retailprice") - 1)
        & (F.col("b.p_retailprice") <= F.col("a.p_retailprice") + 1)
    )
    return (
        a.join(b, cond, "left_semi")
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
        .orderBy("p_partkey")
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


@query(
    "join_cross_bounded",
    oracle="""
    SELECT a.r_regionkey AS region_a, b.r_regionkey AS region_b
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey < b.r_regionkey
    ORDER BY region_a, region_b
    """,
)
def join_cross_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (bounded: tiny dimension × itself, upper-triangle)."""
    a = _t(spark, sf_dir, "region").alias("a")
    b = _t(spark, sf_dir, "region").alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.r_regionkey") < F.col("b.r_regionkey"))
        .select(
            F.col("a.r_regionkey").alias("region_a"),
            F.col("b.r_regionkey").alias("region_b"),
        )
        .orderBy("region_a", "region_b")
    )


# --------------------------------------------------------------------------
# Aggregations (§2.4)
# --------------------------------------------------------------------------

@query(
    "agg_basic",
    oracle="""
    SELECT o_orderstatus,
           count(*)                       AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avg_price,
           min(o_totalprice)              AS min_price,
           max(o_totalprice)              AS max_price
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count/sum/avg/min/max — partial (map-side) + final hash agg."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("sum_price"),
            _davg(F.col("o_totalprice")).alias("avg_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey)  AS n_suppliers,
           count(DISTINCT l_partkey)  AS n_parts
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase agg in Spark)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
        .orderBy("l_returnflag")
    )


@query("agg_approx_distinct", oracle=None)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approximate distinct (sketch differs from DuckDB's, so
    rows-only check; pytest asserts it is within 5% of exact)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"))
        .orderBy("l_returnflag")
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT n_regionkey, list(n_name ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list → array, sorted for determinism across engines."""
    n = _t(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(F.array_sort(F.collect_list("n_name")).alias("nations"))
        .orderBy("n_regionkey")
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (grand total + per-flag + per-flag-status)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(_dsum(F.col("l_quantity")).alias("sum_qty"), F.count("*").alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT c_mktsegment, c_nationkey, count(*) AS n,
           CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface (same Catalyst plan as
    the DataFrame cube/rollup family)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, count(*) AS n,
               CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        ORDER BY c_mktsegment ASC NULLS FIRST, c_nationkey ASC NULLS FIRST
        """
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
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           lag(event_id)  OVER w AS prev_event,
           lead(event_id) OVER w AS next_event,
           epoch_us(CAST(ts AS TIMESTAMP)) // 1000000
             - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP)) // 1000000 AS gap_seconds
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, ts, event_id
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead + inter-event gap — the sessionization building block."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_id",
            "ts",
            F.lag("event_id").over(w).alias("prev_event"),
            F.lead("event_id").over(w).alias("next_event"),
            (
                F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
            ).alias("gap_seconds"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


@query(
    "window_running_total",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
           CAST(sum(CAST(value AS DECIMAL(38,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_n
    FROM events
    ORDER BY user_id, ts, event_id
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals with an explicit ROWS frame over event time."""
    e = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.sum(F.col("value").cast("decimal(38,6)"))
            .over(w)
            .cast("double")
            .alias("running_value"),
            F.count("*").over(w).alias("running_n"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


@query(
    "window_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type,
           last_value(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
    FROM events
    ORDER BY user_id
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value per key over the full-partition frame."""
    e = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        e.select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
        )
        .distinct()
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Sorts / limits / top-k (§2.6)
# --------------------------------------------------------------------------

@query(
    "sort_multi_limit",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def sort_multi_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort + limit → TakeOrderedAndProject (no global sort)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(F.asc("o_orderpriority"), F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


@query(
    "deterministic_random_pick",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders
    ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
    LIMIT 1
    """,
)
def deterministic_random_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's `ORDER BY RAND() LIMIT 1` random-row pick
    (data_inserter.py:44,57) made deterministic: order by a hash of the key
    so both engines agree. Same top-1 plan shape as rand()."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey")
        .orderBy(F.md5(F.col("o_orderkey").cast("string")), "o_orderkey")
        .limit(1)
    )


# --------------------------------------------------------------------------
# Set operations (§2.7)
# --------------------------------------------------------------------------

@query(
    "set_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900
    UNION ALL
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
    ORDER BY nationkey
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union — no dedup shuffle)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900)
    s = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000)
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .unionAll(s.select(F.col("s_nationkey").alias("nationkey")))
        .orderBy("nationkey")
    )


@query(
    "set_union_distinct",
    oracle="""
    SELECT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900
      UNION
      SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
    ) ORDER BY nationkey
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics = union + distinct hash agg)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900)
    s = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000)
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .union(s.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
        .orderBy("nationkey")
    )


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
    ORDER BY nationkey
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.intersect(s).orderBy("nationkey")


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000
    ORDER BY nationkey
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): nations with customers but no
    high-balance supplier. ``subtract`` is Spark's EXCEPT DISTINCT."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 8000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s).orderBy("nationkey")


@query(
    "distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem ORDER BY l_returnflag, l_linestatus
    """,
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT on a projection — hash-agg dedup."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Subqueries
# --------------------------------------------------------------------------

@query(
    "scalar_subquery",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal AS acctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                              / count(*) * 1.8
                       FROM customer)
    ORDER BY c_custkey
    """,
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in WHERE (uncorrelated) via the SQL surface.

    The threshold is computed with the exact decimal-avg pattern so the
    boundary is bit-identical in both engines.
    """
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal AS acctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                                  / count(*) * 1.8
                           FROM customer)
        ORDER BY c_custkey
        """
    )


@query(
    "in_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      AND o_totalprice > 300000
    ORDER BY o_orderkey
    """,
)
def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) — planned as a left semi join."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
          AND o_totalprice > 300000
        ORDER BY o_orderkey
        """
    )


@query(
    "correlated_exists",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem WHERE l_suppkey = s.s_suppkey AND l_quantity >= 49
    )
    ORDER BY s_suppkey
    """,
)
def correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — decorrelated by Catalyst into a semi join."""
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (
          SELECT 1 FROM lineitem WHERE l_suppkey = s.s_suppkey AND l_quantity >= 49
        )
        ORDER BY s_suppkey
        """
    )


# --------------------------------------------------------------------------
# Scalar functions (§2.8) + pivot
# --------------------------------------------------------------------------

@query(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                       AS name_upper,
           lower(p_brand)                      AS brand_lower,
           length(p_name)                      AS name_len,
           substr(p_type, 1, 3)                AS type_prefix,
           concat(p_brand, ':', p_type)        AS brand_type,
           replace(p_name, ' ', '_')           AS name_snake,
           trim(p_name)                        AS name_trim,
           CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS has_a
    FROM part WHERE p_partkey <= 100
    ORDER BY p_partkey
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery (upper/lower/length/substr/concat/replace/
    trim/LIKE-case)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_type", 1, 3).alias("type_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.trim("p_name").alias("name_trim"),
        F.when(F.col("p_name").like("%a%"), 1).otherwise(0).alias("has_a"),
    ).orderBy("p_partkey")


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate)     AS INT) AS order_year,
           CAST(month(o_orderdate)    AS INT) AS order_month,
           CAST(dayofmonth(o_orderdate) AS INT) AS order_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT)
             AS days_since_epoch_start
    FROM orders WHERE o_orderkey <= 200
    ORDER BY o_orderkey
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time battery: extract, trunc, interval add, datediff."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp")
        ).alias("days_since_epoch_start"),
    ).orderBy("o_orderkey")


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 30000)              AS abs_diff,
           CAST(ceil(l_quantity / 7) AS BIGINT)      AS qty_ceil,
           CAST(floor(l_quantity / 7) AS BIGINT)     AS qty_floor,
           sqrt(l_extendedprice)                     AS price_sqrt,
           round(ln(l_extendedprice + 1), 6)         AS price_ln,
           l_discount * l_discount                   AS disc_sq,
           CAST(l_quantity AS BIGINT) % 5            AS qty_mod
    FROM lineitem WHERE l_orderkey <= 60
    ORDER BY l_orderkey, l_linenumber
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery: abs/ceil/floor/sqrt/ln/pow/mod."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 60)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 30000).alias("abs_diff"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil"),
        F.floor(F.col("l_quantity") / 7).alias("qty_floor"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        (F.col("l_discount") * F.col("l_discount")).alias("disc_sq"),
        (F.col("l_quantity").cast("bigint") % 5).alias("qty_mod"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "scalar_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
           event_type
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
    ORDER BY event_id
    """,
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction on events.props (kept as string at rest —
    same decision as the reference's json→String mapping,
    consumer_to_file.py:48-49 — parsed on demand)."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_id", k.alias("prop_k"), "event_type")
        .filter(F.col("prop_k") > 90)
        .orderBy("event_id")
    )


@query(
    "scalar_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm
    FROM orders WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
)
def scalar_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN banding + coalesce/nullif null handling."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")
        ).alias("status_norm"),
    ).orderBy("o_orderkey")


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS status_P
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide counts per status) — fixed pivot values so the plan is a
    single pass, no distinct-values pre-query."""
    o = _t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return (
        piv.select(
            "o_orderpriority",
            F.coalesce(F.col("O"), F.lit(0)).alias("status_O"),
            F.coalesce(F.col("F"), F.lit(0)).alias("status_F"),
            F.coalesce(F.col("P"), F.lit(0)).alias("status_P"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "unpivot_stack",
    oracle="""
    SELECT p_partkey, metric, round(val, 2) AS val
    FROM (
      SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS val FROM part
      UNION ALL
      SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
    )
    WHERE p_partkey <= 50
    ORDER BY p_partkey, metric
    """,
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot via stack() — wide→long without a join."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 50)
    return (
        p.selectExpr(
            "p_partkey",
            "stack(2, 'retailprice', p_retailprice, 'size', CAST(p_size AS DOUBLE)) AS (metric, val)",
        )
        .select("p_partkey", "metric", F.round("val", 2).alias("val"))
        .orderBy("p_partkey", "metric")
    )
