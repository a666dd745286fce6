"""Managed-table layer: partition pruning, bucketed zero-shuffle joins,
file-format round trips. The co-location and pruning claims are verified
against the physical plan, not just row counts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.sources import files, tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def warehouse(spark, tmp_path_factory):
    yield str(tmp_path_factory.mktemp("warehouse"))
    for t in ("li_b", "ord_b", "ord_part"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    tables.write_bucketed(
        li, "li_b", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"], path=f"{warehouse}/li_b",
    )
    tables.write_bucketed(
        orders, "ord_b", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"], path=f"{warehouse}/ord_b",
    )

    joined = tables.bucketed_join(spark, "li_b", "ord_b", ["l_orderkey"])
    tables.assert_no_shuffle_join(joined)  # the whole point
    expected = li.join(orders, "l_orderkey").count()
    assert joined.count() == expected


def test_unbucketed_join_does_shuffle(spark):
    """Sanity check that the verifier detects shuffles (and that the
    broadcast threshold doesn't silently hide them at this size)."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet").hint("merge")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    with pytest.raises(AssertionError):
        tables.assert_no_shuffle_join(j)


def test_partitioned_table_prunes(spark, warehouse):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    tables.write_partitioned(
        orders, "ord_part", ["o_orderstatus"],
        sort_cols=["o_orderdate"], path=f"{warehouse}/ord_part",
    )
    q = spark.table("ord_part").filter(F.col("o_orderstatus") == "F")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "o_orderstatus" not in plan.split("ReadSchema")[-1].split("]")[0], plan
    expected = orders.filter(F.col("o_orderstatus") == "F").count()
    assert q.count() == expected


def test_csv_json_orc_roundtrip(spark, tmp_path):
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    files.write_csv(nation, str(tmp_path / "n_csv"))
    files.write_json(nation, str(tmp_path / "n_json"))
    files.write_orc(nation, str(tmp_path / "n_orc"))
    schema = "n_nationkey int, n_name string, n_regionkey int"
    back_csv = files.read_csv(spark, str(tmp_path / "n_csv"), schema)
    back_json = files.read_json(spark, str(tmp_path / "n_json"), schema)
    back_orc = files.read_orc(spark, str(tmp_path / "n_orc"))
    orig = {tuple(r) for r in nation.collect()}
    assert {tuple(r) for r in back_csv.collect()} == orig
    assert {tuple(r) for r in back_json.collect()} == orig
    assert {tuple(r) for r in back_orc.collect()} == orig


def test_jdbc_gated(spark):
    """External-server URLs with no driver still gate loudly."""
    with pytest.raises(files.JdbcUnavailable):
        files.read_jdbc(spark, "jdbc:clickhouse://localhost:8123/raw", "employees")


_DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


def test_jdbc_real_roundtrip_embedded_derby(spark, tmp_path):
    """S13 for REAL, in-container: Spark ships embedded Derby, so the
    JDBC write sink and the partitioned parallel read run against an
    actual SQL database — N concurrent range queries, not a mock."""
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    files.write_jdbc(
        nation, url, "nation", mode="overwrite", driver=_DERBY
    )
    back = files.read_jdbc(
        spark, url, "nation",
        partition_column="n_nationkey", num_partitions=4,
        lower_bound=0, upper_bound=25, driver=_DERBY,
    )
    assert back.rdd.getNumPartitions() == 4  # real partitioned read
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in nation.collect()
    }
    # append mode really appends
    files.write_jdbc(nation.limit(3), url, "nation", driver=_DERBY)
    assert files.read_jdbc(spark, url, "nation", driver=_DERBY).count() == (
        nation.count() + 3
    )
    # predicate pushdown reaches the database: the filtered scan's plan
    # carries the JDBC-pushed filter, not a Spark-side post-filter only
    filtered = files.read_jdbc(spark, url, "nation", driver=_DERBY).filter(
        "n_regionkey = 0"
    )
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "n_regionkey" in plan.split(
        "PushedFilters"
    )[1][:120]


def test_jdbc_write_failure_gates(spark):
    df = spark.range(3)
    with pytest.raises(files.JdbcUnavailable):
        files.write_jdbc(df, "jdbc:clickhouse://localhost:8123/raw", "t")


@pytest.mark.parametrize(
    "sf_dir",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"],
)
def test_events_ts_loads_as_ltz_timestamp(spark, sf_dir):
    """Environment canary: the driver has regenerated events.parquet twice
    (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)/no-tz), and each change broke a
    different part of the surface. catalog.load_table normalizes every
    physical form to a session-tz TIMESTAMP; if the fixture or engine
    drifts again, THIS test fails first, in one obvious place, instead of
    window_analytics + cdc_normalize_values + the bench all going red.
    """
    from pyspark.sql.types import TimestampType

    from basic_data_pipeline_spark import catalog

    df = catalog.load_table(spark, sf_dir, "events")
    ts_field = df.schema["ts"]
    assert isinstance(ts_field.dataType, TimestampType), ts_field.dataType
    # The two Spark-4 pain points that went red in round 4 must both work:
    df.select(
        F.col("ts").cast("long"), F.unix_millis(F.col("ts"))
    ).limit(1).collect()


def test_fixture_schema_canary(spark):
    """Whole-fixture schema pin: the driver has regenerated fixtures
    between rounds with changed physical types before (events.ts
    NANOS → MICROS/no-tz broke three surfaces in round 4). This canary
    makes ANY fixture/engine type drift fail in one obvious place, with
    the full expected-vs-actual diff, so the next change is a deliberate
    re-audit instead of scattered query failures. events.ts is asserted
    post-normalization (catalog.load_table)."""
    from basic_data_pipeline_spark import catalog

    expected = {
        "region": [("r_regionkey", "int"), ("r_name", "string")],
        "nation": [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
        "customer": [("c_custkey", "bigint"), ("c_name", "string"), ("c_nationkey", "int"), ("c_acctbal", "double"), ("c_mktsegment", "string")],
        "supplier": [("s_suppkey", "bigint"), ("s_name", "string"), ("s_nationkey", "int"), ("s_acctbal", "double")],
        "part": [("p_partkey", "bigint"), ("p_name", "string"), ("p_brand", "string"), ("p_type", "string"), ("p_size", "int"), ("p_retailprice", "double")],
        "orders": [("o_orderkey", "bigint"), ("o_custkey", "bigint"), ("o_orderstatus", "string"), ("o_totalprice", "double"), ("o_orderdate", "timestamp_ntz"), ("o_orderpriority", "string")],
        "lineitem": [("l_orderkey", "bigint"), ("l_partkey", "bigint"), ("l_suppkey", "bigint"), ("l_linenumber", "int"), ("l_quantity", "double"), ("l_extendedprice", "double"), ("l_discount", "double"), ("l_tax", "double"), ("l_returnflag", "string"), ("l_linestatus", "string"), ("l_shipdate", "timestamp_ntz")],
        "events": [("event_id", "bigint"), ("ts", "timestamp"), ("user_id", "bigint"), ("event_type", "string"), ("value", "double"), ("props", "string")],
        "documents": [("doc_id", "bigint"), ("text", "string"), ("lang", "string"), ("source", "string"), ("n_chars", "bigint")],
        "embeddings": [("vec_id", "bigint"), ("embedding", "array<float>"), ("label", "int")],
    }
    got = {
        t: catalog.load_table(spark, "/root/testdata/sf0.001", t).dtypes
        for t in catalog.TABLES
    }
    assert got == {k: [tuple(x) for x in v] for k, v in expected.items()}
