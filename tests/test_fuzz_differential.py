"""Differential fuzzing: deterministic pseudo-random queries from a safe
shared-SQL grammar run on BOTH Spark and DuckDB over the same parquet —
row counts and order-insensitive value hashes must match.

This extends the hand-written oracle suite the same way SQLsmith extends
hand-written engine tests: the grammar covers the relational core
(predicate combinations, group-bys with exact aggregates, projections)
using only constructs both engines define identically (no floats in
aggregates without the decimal pattern, no engine-specific functions).
Seeds are FIXED — failures reproduce exactly; bump N_CASES to widen."""

from __future__ import annotations

import math
import random

import duckdb
import pytest

#: slow tier (r12): 361 generated differential queries; the per-family example pins cover the default tier
pytestmark = pytest.mark.slow

SF_DIR = "/root/testdata/sf0.001"
# Counts doubled in round 5 as the Spark-4 ANSI-drift audit (VERDICT r4 #4):
# ANSI mode is now ON by default, turning former silent-null casts into
# runtime errors, so the grammar must keep agreeing with DuckDB under it.
N_CASES = 80

# (table, [(col, type)]) — integer/string/exact-decimal columns only; no
# raw-double aggregation (engines disagree on accumulation order).
TABLES = {
    "orders": [
        ("o_orderkey", "int"),
        ("o_custkey", "int"),
        ("o_orderstatus", "str"),
        ("o_orderpriority", "str"),
        ("o_totalprice", "money"),
    ],
    "customer": [
        ("c_custkey", "int"),
        ("c_nationkey", "int"),
        ("c_mktsegment", "str"),
        ("c_acctbal", "money"),
    ],
    "lineitem": [
        ("l_orderkey", "int"),
        ("l_partkey", "int"),
        ("l_suppkey", "int"),
        ("l_linenumber", "int"),
        ("l_quantity", "money"),
        ("l_extendedprice", "money"),
        ("l_returnflag", "str"),
        ("l_linestatus", "str"),
    ],
}

STR_LITS = {
    "o_orderstatus": ["'O'", "'F'", "'P'"],
    "o_orderpriority": ["'1-URGENT'", "'3-MEDIUM'", "'5-LOW'"],
    "c_mktsegment": ["'BUILDING'", "'MACHINERY'", "'AUTOMOBILE'"],
    "l_returnflag": ["'A'", "'N'", "'R'"],
    "l_linestatus": ["'O'", "'F'"],
}


def _predicate(rng: random.Random, cols) -> str:
    col, typ = rng.choice(cols)
    if typ == "str":
        lits = STR_LITS[col]
        if rng.random() < 0.5:
            return f"{col} = {rng.choice(lits)}"
        return f"{col} IN ({', '.join(rng.sample(lits, 2))})"
    if typ == "money":
        lo = rng.randint(0, 200000)
        return rng.choice(
            [
                f"{col} > {lo}",
                f"{col} <= {lo}",
                f"{col} BETWEEN {lo} AND {lo + rng.randint(1, 100000)}",
            ]
        )
    lo = rng.randint(0, 1000)
    return rng.choice(
        [
            f"{col} % {rng.randint(2, 13)} = {rng.randint(0, 1)}",
            f"{col} < {lo * 10}",
            f"{col} >= {lo}",
        ]
    )


def _gen_query(seed: int) -> str:
    rng = random.Random(seed)
    table = rng.choice(list(TABLES))
    cols = TABLES[table]
    preds = " AND ".join(
        _predicate(rng, cols) for _ in range(rng.randint(1, 3))
    )
    int_cols = [c for c, t in cols if t == "int"]
    str_cols = [c for c, t in cols if t == "str"]
    money_cols = [c for c, t in cols if t == "money"]
    if rng.random() < 0.5 and str_cols:
        # aggregate: group by a string col, exact aggregates only
        g = rng.choice(str_cols)
        m = rng.choice(money_cols)
        i = rng.choice(int_cols)
        return (
            f"SELECT {g} AS k, count(*) AS n,"
            f" CAST(sum(CAST({m} AS DECIMAL(38,6))) AS DOUBLE) AS s,"
            f" min({i}) AS mn, max({i}) AS mx,"
            f" count(DISTINCT {i}) AS nd"
            f" FROM {table} WHERE {preds} GROUP BY {g}"
        )
    proj = ", ".join(c for c, _ in rng.sample(cols, min(3, len(cols))))
    return f"SELECT {proj} FROM {table} WHERE {preds}"


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


def _result_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_canon_cell(r[i]) for i in order) for r in rows)
    return len(rows), hash(tuple(lines))


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def spark_views(spark):
    for t in TABLES:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").createOrReplaceTempView(t)
    return spark


def _assert_differential(sql: str, duck, spark_views, seed) -> None:
    srows = spark_views.sql(sql).collect()
    scols = spark_views.sql(sql).columns
    drel = duck.execute(sql)
    dcols = [d[0] for d in drel.description]
    drows = drel.fetchall()
    assert [c.lower() for c in scols] == [c.lower() for c in dcols], sql
    assert _result_hash(scols, [tuple(r) for r in srows]) == _result_hash(
        dcols, drows
    ), f"mismatch for seed {seed}: {sql}"


@pytest.mark.parametrize("seed", range(N_CASES))
def test_differential_query(seed, duck, spark_views):
    _assert_differential(_gen_query(seed), duck, spark_views, seed)


JOINS = [
    ("orders", "customer", "o_custkey = c_custkey"),
    ("lineitem", "orders", "l_orderkey = o_orderkey"),
]


def _gen_join_query(seed: int) -> str:
    rng = random.Random(10_000 + seed)
    lt, rt, on = rng.choice(JOINS)
    lcols, rcols = TABLES[lt], TABLES[rt]
    preds = " AND ".join(
        _predicate(rng, rng.choice([lcols, rcols])) for _ in range(rng.randint(1, 2))
    )
    jt = rng.choice(["JOIN", "LEFT JOIN"])
    g = rng.choice([c for c, t in lcols + rcols if t == "str"])
    m = rng.choice([c for c, t in lcols if t == "money"])
    i = rng.choice([c for c, t in rcols if t == "int"])
    if rng.random() < 0.5:
        return (
            f"SELECT {g} AS k, count(*) AS n,"
            f" CAST(sum(CAST({m} AS DECIMAL(38,6))) AS DOUBLE) AS s,"
            f" count(DISTINCT {i}) AS nd"
            f" FROM {lt} {jt} {rt} ON {on} WHERE {preds} GROUP BY {g}"
        )
    lk = [c for c, t in lcols if t == "int"][0]
    return (
        f"SELECT {lk}, {g}, {m} FROM {lt} {jt} {rt} ON {on} WHERE {preds}"
    )


@pytest.mark.parametrize("seed", range(40))
def test_differential_join_query(seed, duck, spark_views):
    _assert_differential(_gen_join_query(seed), duck, spark_views, seed)


def _gen_window_query(seed: int) -> str:
    rng = random.Random(20_000 + seed)
    table = rng.choice(list(TABLES))
    cols = TABLES[table]
    str_cols = [c for c, t in cols if t == "str"]
    int_cols = [c for c, t in cols if t == "int"]
    money_cols = [c for c, t in cols if t == "money"]
    part = rng.choice(str_cols)
    order_m = rng.choice(money_cols)
    order_i = rng.choice(int_cols)
    fn = rng.choice(["row_number()", "rank()", "dense_rank()"])
    k = rng.randint(1, 5)
    pred = _predicate(rng, cols)
    # deterministic total order inside the window: money then unique-ish int
    return (
        f"SELECT * FROM ("
        f" SELECT {part} AS p, {order_i} AS i,"
        f" {fn} OVER (PARTITION BY {part}"
        f" ORDER BY {order_m} DESC, {order_i}) AS rn"
        f" FROM {table} WHERE {pred})"
        f" WHERE rn <= {k}"
    )


@pytest.mark.parametrize("seed", range(30))
def test_differential_window_query(seed, duck, spark_views):
    _assert_differential(_gen_window_query(seed), duck, spark_views, seed)


def _gen_setop_query(seed: int) -> str:
    """Set operations (§2.6): branches over the same table with different
    predicates, combined by UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL] —
    identical multiset/set semantics in both engines. Shapes: plain
    two-branch, three-branch chains (left-associative in both engines),
    aggregated branches (set op over GROUP BY outputs), and a set op fed
    into an outer exact aggregate."""
    rng = random.Random(30_000 + seed)
    table = rng.choice(list(TABLES))
    cols = TABLES[table]
    proj = ", ".join(c for c, _ in rng.sample(cols, min(3, len(cols))))

    def branch() -> str:
        p = " AND ".join(
            _predicate(rng, cols) for _ in range(rng.randint(1, 2))
        )
        return f"SELECT {proj} FROM {table} WHERE {p}"

    ops = ["UNION ALL", "UNION", "INTERSECT", "EXCEPT",
           "INTERSECT ALL", "EXCEPT ALL"]
    shape = rng.randrange(4)
    if shape == 0:  # plain two-branch
        return f"{branch()} {ops[rng.randrange(len(ops))]} {branch()}"
    if shape == 1:  # three-branch chain, left-associative in both engines
        o1, o2 = rng.choice(ops), rng.choice(ops)
        return f"{branch()} {o1} {branch()} {o2} {branch()}"
    g = rng.choice([c for c, t in cols if t == "str"])
    i = rng.choice([c for c, t in cols if t == "int"])
    if shape == 2:  # set op over aggregated branches
        op = rng.choice(ops)
        p1 = _predicate(rng, cols)
        p2 = _predicate(rng, cols)
        return (
            f"SELECT {g} AS k, count(*) AS n, min({i}) AS mn"
            f" FROM {table} WHERE {p1} GROUP BY {g}"
            f" {op} SELECT {g}, count(*), min({i})"
            f" FROM {table} WHERE {p2} GROUP BY {g}"
        )
    # outer aggregate over a set-op derived table
    op = rng.choice(ops)
    return (
        f"SELECT count(*) AS n, count(DISTINCT {proj.split(', ')[0]}) AS nd"
        f" FROM ({branch()} {op} {branch()}) t"
    )


@pytest.mark.parametrize("seed", range(40))
def test_differential_setop_query(seed, duck, spark_views):
    _assert_differential(_gen_setop_query(seed), duck, spark_views, seed)


# (outer table, inner table, outer key, inner key) — key domains overlap
SUBQ_LINKS = [
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("customer", "orders", "c_custkey", "o_custkey"),
]


def _gen_subquery_query(seed: int) -> str:
    """Nested subqueries (§2.7): IN / NOT IN / correlated [NOT] EXISTS /
    scalar comparisons, two-level IN-of-IN, correlated scalar subqueries
    in the SELECT list, and HAVING over an uncorrelated scalar. Keys are
    non-null ints, so NOT IN's three-valued-logic trap can't bite and
    both engines agree."""
    rng = random.Random(40_000 + seed)
    outer, inner, okey, ikey = rng.choice(SUBQ_LINKS)
    ocols, icols = TABLES[outer], TABLES[inner]
    proj = ", ".join(c for c, _ in rng.sample(ocols, min(3, len(ocols))))
    pred_o = _predicate(rng, ocols)
    pred_i = _predicate(rng, icols)
    shape = rng.randrange(7)
    if shape == 0:  # [NOT] IN
        neg = rng.choice(["", "NOT "])
        return (
            f"SELECT {proj} FROM {outer} WHERE {okey} {neg}IN"
            f" (SELECT {ikey} FROM {inner} WHERE {pred_i}) AND {pred_o}"
        )
    if shape == 1:  # correlated EXISTS
        return (
            f"SELECT {proj} FROM {outer} WHERE EXISTS"
            f" (SELECT 1 FROM {inner} WHERE {ikey} = {okey} AND {pred_i})"
            f" AND {pred_o}"
        )
    if shape == 2:  # scalar subquery comparison (empty inner → NULL → no rows)
        int_i = [c for c, t in icols if t == "int"][0]
        op = rng.choice(["<", ">=", "<="])
        return (
            f"SELECT {proj} FROM {outer} WHERE {okey} {op}"
            f" (SELECT max({int_i}) FROM {inner} WHERE {pred_i}) AND {pred_o}"
        )
    if shape == 3:  # two-level nesting: IN of IN
        o2, i2, ok2, ik2 = rng.choice(
            [l for l in SUBQ_LINKS if l[0] == inner]
            or [(inner, outer, ikey, okey)]
        )
        pred_i2 = _predicate(rng, TABLES[i2])
        return (
            f"SELECT {proj} FROM {outer} WHERE {okey} IN"
            f" (SELECT {ikey} FROM {inner} WHERE {ok2} IN"
            f" (SELECT {ik2} FROM {i2} WHERE {pred_i2}) AND {pred_i})"
            f" AND {pred_o}"
        )
    if shape == 4:  # correlated NOT EXISTS (anti-join decorrelation path)
        return (
            f"SELECT {proj} FROM {outer} WHERE NOT EXISTS"
            f" (SELECT 1 FROM {inner} WHERE {ikey} = {okey} AND {pred_i})"
            f" AND {pred_o}"
        )
    if shape == 5:  # correlated scalar subquery in the SELECT list
        int_i = [c for c, t in icols if t == "int"][0]
        return (
            f"SELECT {okey} AS k,"
            f" (SELECT count(*) FROM {inner}"
            f"  WHERE {ikey} = {okey} AND {pred_i}) AS sub_n,"
            f" (SELECT max({int_i}) FROM {inner}"
            f"  WHERE {ikey} = {okey}) AS sub_mx"
            f" FROM {outer} WHERE {pred_o}"
        )
    # HAVING against an uncorrelated scalar subquery
    g = rng.choice([c for c, t in ocols if t == "str"])
    return (
        f"SELECT {g} AS k, count(*) AS n FROM {outer} WHERE {pred_o}"
        f" GROUP BY {g} HAVING count(*) >"
        f" (SELECT count(*) FROM {inner} WHERE {pred_i}) / 20"
    )


@pytest.mark.parametrize("seed", range(40))
def test_differential_subquery_query(seed, duck, spark_views):
    _assert_differential(_gen_subquery_query(seed), duck, spark_views, seed)


def _gen_scalar_query(seed: int) -> str:
    """Scalar-expression battery aimed at Spark-4 ANSI drift: CASE, string
    functions, round-trip casts, try_cast of malformed strings, and modular
    arithmetic — the constructs whose silent-null behavior ANSI mode turned
    into runtime errors. Every expression here is defined identically in
    both engines WITH ansi on, so a mismatch (or a Spark-side throw) is a
    real semantics bug, not fuzz noise."""
    rng = random.Random(50_000 + seed)
    table = rng.choice(list(TABLES))
    cols = TABLES[table]
    str_c = rng.choice([c for c, t in cols if t == "str"])
    int_c = rng.choice([c for c, t in cols if t == "int"])
    money_c = rng.choice([c for c, t in cols if t == "money"])
    pred = _predicate(rng, cols)
    lit = STR_LITS[str_c][0]
    exprs = [
        f"{int_c} AS id",
        f"CASE WHEN {str_c} = {lit} THEN 'hit' ELSE lower({str_c}) END AS c_case",
        f"upper(substr({str_c}, 1, {rng.randint(1, 3)})) AS c_sub",
        f"length({str_c}) AS c_len",
        f"{str_c} || '_' || CAST({int_c} % 97 AS STRING) AS c_cat",
        # exact-int cast round trip: DECIMAL holds the money value exactly,
        # floor() of it is a safe (never-overflow, never-malformed) ANSI cast
        f"CAST(floor(CAST({money_c} AS DECIMAL(38,6))) AS BIGINT) AS c_cast",
        # try_cast of sometimes-malformed input: both engines define NULL
        # on failure even under ANSI
        f"TRY_CAST(substr({str_c}, 1, 1) AS INTEGER) AS c_try",
        f"abs({int_c} - 500) + {int_c} % {rng.randint(2, 13)} AS c_math",
    ]
    proj = ", ".join(rng.sample(exprs, rng.randint(3, len(exprs))))
    return f"SELECT {proj} FROM {table} WHERE {pred}"


@pytest.mark.parametrize("seed", range(30))
def test_differential_scalar_ansi_query(seed, duck, spark_views):
    _assert_differential(_gen_scalar_query(seed), duck, spark_views, seed)


def _gen_rollup_query(seed: int) -> str:
    """Multi-level aggregation (§2.4): ROLLUP / CUBE / GROUPING SETS over
    two string columns with exact aggregates + HAVING — identical
    null-extension and grouping() semantics in both engines ON NON-EMPTY
    INPUT. Empty input is a genuine divergence the fuzzer caught (pinned
    in test_rollup_empty_input_divergence below), so this shape uses only
    always-selective string predicates."""
    rng = random.Random(60_000 + seed)
    table = rng.choice(["orders", "lineitem"])
    cols = TABLES[table]
    str_cols = [c for c, t in cols if t == "str"]
    g1, g2 = rng.sample(str_cols, 2) if len(str_cols) >= 2 else (str_cols[0],) * 2
    m = rng.choice([c for c, t in cols if t == "money"])
    i = rng.choice([c for c, t in cols if t == "int"])
    pred = _predicate(rng, str_cols and [(c, "str") for c in str_cols])
    form = rng.choice(
        [
            f"ROLLUP ({g1}, {g2})",
            f"CUBE ({g1}, {g2})",
            f"GROUPING SETS (({g1}), ({g2}), ())",
        ]
    )
    having = ""
    if rng.random() < 0.5:
        having = f" HAVING count(*) > {rng.randint(1, 50)}"
    return (
        f"SELECT {g1} AS k1, {g2} AS k2, count(*) AS n,"
        f" CAST(sum(CAST({m} AS DECIMAL(38,6))) AS DOUBLE) AS s,"
        f" min({i}) AS mn"
        f" FROM {table} WHERE {pred} GROUP BY {form}{having}"
    )


@pytest.mark.parametrize("seed", range(25))
def test_differential_rollup_query(seed, duck, spark_views):
    _assert_differential(_gen_rollup_query(seed), duck, spark_views, seed)


def test_rollup_empty_input_divergence(duck, spark_views):
    """Documented engine divergence (found by the rollup fuzz shape):
    GROUP BY ROLLUP over an EMPTY relation yields the grand-total row
    (NULL, NULL, count 0) in DuckDB — the standard reading, grouping set
    () aggregates zero rows — but ZERO rows in Spark 4. Pin both so a
    future Spark alignment shows up here instead of as fuzz noise."""
    sql = (
        "SELECT l_returnflag AS k1, l_linestatus AS k2, count(*) AS n"
        " FROM lineitem WHERE l_quantity < 0"
        " GROUP BY ROLLUP (l_returnflag, l_linestatus)"
    )
    assert spark_views.sql(sql).count() == 0
    assert duck.execute(sql).fetchall() == [(None, None, 0)]


def _gen_temporal_query(seed: int) -> str:
    """Temporal shape aimed at the round-4 failure family: the fixture's
    o_orderdate loads as TIMESTAMP_NTZ in Spark 4 and plain TIMESTAMP in
    DuckDB, and both must agree on extraction (year/month/day), coarse
    truncation, literal comparison, and grouping — under the pinned UTC
    session timezone these are value-identical."""
    rng = random.Random(70_000 + seed)
    y = rng.randint(1993, 1997)
    pred2 = _predicate(rng, TABLES["orders"])
    shape = rng.randrange(3)
    if shape == 0:  # extraction grouping
        return (
            "SELECT year(o_orderdate) AS yy, month(o_orderdate) AS mm,"
            " count(*) AS n, min(o_orderkey) AS mn"
            f" FROM orders WHERE {pred2}"
            " GROUP BY year(o_orderdate), month(o_orderdate)"
        )
    if shape == 1:  # literal comparison + truncation
        return (
            "SELECT o_orderkey, CAST(date_trunc('month', o_orderdate) AS DATE)"
            " AS mstart"
            f" FROM orders WHERE o_orderdate >= TIMESTAMP '{y}-0{rng.randint(1, 9)}-01'"
            f" AND o_orderdate < TIMESTAMP '{y + 1}-01-01' AND {pred2}"
        )
    # day arithmetic: quarter + day-of-month extraction, grouped
    return (
        "SELECT quarter(o_orderdate) AS q, CAST(day(o_orderdate) AS INT) AS d,"
        " count(*) AS n"
        f" FROM orders WHERE year(o_orderdate) = {y}"
        " GROUP BY quarter(o_orderdate), day(o_orderdate)"
    )


@pytest.mark.parametrize("seed", range(20))
def test_differential_temporal_query(seed, duck, spark_views):
    _assert_differential(_gen_temporal_query(seed), duck, spark_views, seed)


def _gen_pivot_query(seed: int) -> str:
    """Conditional-aggregation pivot (the engine-portable pivot form):
    one column per bucket of a deterministic int partitioning, exact
    decimal sums — §2 pivot semantics without engine-specific PIVOT
    syntax drift."""
    rng = random.Random(90_000 + seed)
    table = rng.choice(list(TABLES))
    cols = TABLES[table]
    g = rng.choice([c for c, t in cols if t == "str"])
    i = rng.choice([c for c, t in cols if t == "int"])
    m = rng.choice([c for c, t in cols if t == "money"])
    k = rng.randint(2, 4)
    preds = _predicate(rng, cols)
    buckets = ",\n  ".join(
        f"CAST(sum(CASE WHEN {i} % {k} = {b} THEN"
        f" CAST({m} AS DECIMAL(38,6)) END) AS DOUBLE) AS p{b},"
        f" count(CASE WHEN {i} % {k} = {b} THEN 1 END) AS n{b}"
        for b in range(k)
    )
    return (
        f"SELECT {g} AS grp,\n  {buckets}\n"
        f"FROM {table} WHERE {preds} GROUP BY {g}"
    )


@pytest.mark.parametrize("seed", range(20))
def test_differential_pivot_query(seed, duck, spark_views):
    _assert_differential(_gen_pivot_query(seed), duck, spark_views, seed)


def _gen_lateral_query(seed: int) -> str:
    """LATERAL subqueries in FROM — both the computed-projection form and
    the correlated-aggregate form, identical syntax in Spark (3.2+) and
    DuckDB."""
    rng = random.Random(95_000 + seed)
    if rng.random() < 0.5:
        k = rng.randint(2, 9)
        j = rng.randint(1, k)
        mod = rng.randint(3, 11)
        return (
            "SELECT o.o_orderkey, l.d, l.r\n"
            "FROM orders o, LATERAL (SELECT"
            f" CAST(CAST(o.o_totalprice AS DECIMAL(38,6)) - {k} AS DOUBLE)"
            f" AS d, o.o_orderkey % {mod} AS r) l\n"
            f"WHERE o.o_custkey % {k} = 0 AND l.r < {j}"
        )
    mod = rng.randint(5, 17)
    agg = rng.choice(
        ["max(o_totalprice)", "min(o_totalprice)", "count(*)"]
    )
    return (
        "SELECT c.c_custkey, x.v\n"
        f"FROM customer c, LATERAL (SELECT {agg} AS v FROM orders"
        " WHERE o_custkey = c.c_custkey"
        f" AND o_orderkey % {mod % 3 + 1} = 0) x\n"
        f"WHERE c.c_custkey % {mod} = 0"
    )


@pytest.mark.parametrize("seed", range(20))
def test_differential_lateral_query(seed, duck, spark_views):
    _assert_differential(_gen_lateral_query(seed), duck, spark_views, seed)


def _gen_orderlimit_query(seed: int) -> str:
    """Sort/limit shape (§2.6): top-k under a TOTAL order (money tiebroken
    by a unique-ish int key) so the limited set is engine-independent."""
    rng = random.Random(80_000 + seed)
    table = rng.choice(list(TABLES))
    cols = TABLES[table]
    m = rng.choice([c for c, t in cols if t == "money"])
    # ALL int columns as tiebreakers: (l_orderkey, …, l_linenumber) is a
    # unique key for lineitem, single int keys are unique elsewhere — the
    # order must be TOTAL or the limit boundary is engine-dependent
    ties = ", ".join(c for c, t in cols if t == "int")
    pred = _predicate(rng, cols)
    k = rng.randint(1, 40)
    direction = rng.choice(["ASC", "DESC"])
    proj = ", ".join(c for c, _ in rng.sample(cols, min(3, len(cols))))
    return (
        f"SELECT {proj} FROM {table} WHERE {pred}"
        f" ORDER BY {m} {direction}, {ties} LIMIT {k}"
    )


@pytest.mark.parametrize("seed", range(15))
def test_differential_orderlimit_query(seed, duck, spark_views):
    _assert_differential(_gen_orderlimit_query(seed), duck, spark_views, seed)
