"""JDBC CDC sink (sources/jdbc_sink.py) against embedded Derby.

The differential twin pattern: the SAME envelope batches run through the
parquet SinkTable and the JdbcSinkTable (via apply_cdc_batch's
sink_factory), and the final store contents must agree row-for-row —
plus the imperative expected_final_state oracle for compact mode. This
is the closest in-container replica of the reference's actual core path
(Kafka envelopes → SQL store with DDL auto-create/evolve and per-key
deletes, consumer_to_file.py:129-168, 204-250).
"""

from __future__ import annotations

import pytest

from basic_data_pipeline_spark.sources import jdbc_sink
from basic_data_pipeline_spark.sources.envelopes import (
    employee_workload,
    envelopes_to_df,
    expected_final_state,
)
from basic_data_pipeline_spark.sources.files import JdbcUnavailable
from basic_data_pipeline_spark.sources.jdbc_sink import JdbcSinkTable
from basic_data_pipeline_spark.streaming.ingest import run_batches

_DRV = "org.apache.derby.jdbc.EmbeddedDriver"


def _url(tmp_path) -> str:
    return f"jdbc:derby:{tmp_path}/db;create=true"


def _factory(spark, url):
    return lambda tbl: JdbcSinkTable(spark, url, tbl, driver=_DRV)


def _table_dict(df):
    """Rows as sorted list of per-column dicts — column ORDER differs
    between parquet footers and a store's DDL history, values must not."""
    rows = [r.asDict() for r in df.collect()]
    return sorted(rows, key=lambda d: sorted(d.items(), key=lambda kv: (kv[0], str(kv[1]))).__repr__())


def _batches(spark, wl, n):
    step = (len(wl) + n - 1) // n
    return [envelopes_to_df(spark, wl[i : i + step]) for i in range(0, len(wl), step)]


def test_append_mode_twin_matches_parquet(spark, tmp_path):
    """Append mode incl. version-aware deletes: the JDBC in-place DELETE
    path (apply_delete_versions) must leave exactly the rows the parquet
    broadcast-rewrite path leaves."""
    wl = employee_workload(n_snapshot=10, n_ops=40)
    pq_root, db_root = tmp_path / "pq", tmp_path / "db"
    run_batches(spark, _batches(spark, wl, 3), str(pq_root), mode="append")
    sinks = run_batches(
        spark,
        _batches(spark, wl, 3),
        str(db_root),
        mode="append",
        sink_factory=_factory(spark, _url(db_root)),
    )
    pq = spark.read.option("mergeSchema", "true").parquet(str(pq_root / "employees"))
    jd = sinks["employees"].read()
    assert sorted(jd.columns) == sorted(pq.columns)
    assert _table_dict(jd.select(*sorted(jd.columns))) == _table_dict(
        pq.select(*sorted(pq.columns))
    )


def test_compact_mode_matches_imperative_oracle(spark, tmp_path):
    """Compact mode drives JdbcSinkTable.overwrite (staging + one store
    transaction); the final table is the latest-version-per-key state."""
    wl = employee_workload(n_snapshot=10, n_ops=30)
    sinks = run_batches(
        spark,
        _batches(spark, wl, 3),
        str(tmp_path),
        mode="compact",
        sink_factory=_factory(spark, _url(tmp_path)),
    )
    got = {r["id"]: r for r in sinks["employees"].read().collect()}
    want = expected_final_state(wl)
    assert set(got) == set(want)
    for i, row in want.items():
        assert got[i]["name"] == row["name"]
        assert float(got[i]["salary"]) == float(row["salary"])


def test_schema_drift_alters_store_table(spark, tmp_path):
    """Mid-stream drift (role replaces position/salary) becomes ALTER
    TABLE ADD COLUMN; pre-drift rows null-fill the new column in-store."""
    wl = employee_workload(n_snapshot=6, n_ops=24, schema_drift_at=12)
    half = len(wl) // 2
    sinks = run_batches(
        spark,
        [envelopes_to_df(spark, wl[:half]), envelopes_to_df(spark, wl[half:])],
        str(tmp_path),
        mode="append",
        sink_factory=_factory(spark, _url(tmp_path)),
    )
    jd = sinks["employees"].read()
    cols = set(jd.columns)
    assert {"position", "salary", "role"} <= cols
    # normalize maps absent values to '' (reference semantics), so a row
    # carries exactly one populated shape — never both
    both = jd.filter("role <> '' AND position <> ''").count()
    assert both == 0
    assert jd.filter("role <> ''").count() > 0
    assert jd.filter("position <> ''").count() > 0
    # drifted rows never saw a salary: numeric columns stay store-NULL
    assert jd.filter("role <> '' AND salary IS NOT NULL").count() == 0


def test_replay_dedup_and_restart_recovery(spark, tmp_path):
    """Effectively-once against the store: a replayed epoch in the SAME
    process is offset-filtered; a replay after a RESTART (fresh sinks
    dict) recovers the high-water marks from the store's own
    _cdc_partition/_cdc_offset columns."""
    wl = employee_workload(n_snapshot=8, n_ops=16)
    # drop deletes so row counts are directly comparable across replays
    wl = [e for e in wl if e.op != "d"]
    url = _url(tmp_path)
    raw = envelopes_to_df(spark, wl)
    sinks = run_batches(
        spark, [raw, raw], str(tmp_path), mode="append",
        dedup_replays=True, sink_factory=_factory(spark, url),
    )
    n1 = sinks["employees"].read().count()
    assert n1 == len(wl)  # same-process replay skipped
    # restart: new sink objects, same store — replay must still be caught
    sinks2 = run_batches(
        spark, [raw], str(tmp_path), mode="append",
        dedup_replays=True, sink_factory=_factory(spark, url),
    )
    assert sinks2["employees"].read().count() == len(wl)


def test_delete_then_reinsert_after_delete_survives(spark, tmp_path):
    """The in-place DELETE is version-aware: a re-insert whose version
    postdates the tombstone survives the delete of earlier versions."""
    from basic_data_pipeline_spark.sources.envelopes import Envelope

    topic = "dbserver1.testdb.employees"
    ts = 1_722_900_000_000
    row1 = {"id": 1, "name": "ada", "updated_on": ts}
    row2 = {"id": 1, "name": "ada2", "updated_on": ts + 5000}
    wl = [
        Envelope(topic, "c", None, row1, ts, 0, 0),
        Envelope(topic, "d", row1, None, ts + 1000, 0, 1),
        Envelope(topic, "c", None, row2, ts + 5000, 0, 2),
    ]
    sinks = run_batches(
        spark,
        [envelopes_to_df(spark, wl)],
        str(tmp_path),
        mode="append",
        sink_factory=_factory(spark, _url(tmp_path)),
    )
    names = [r["name"] for r in sinks["employees"].read().collect()]
    assert names == ["ada2"]


def test_unsafe_table_name_refused(spark, tmp_path):
    with pytest.raises(JdbcUnavailable, match="unsafe"):
        JdbcSinkTable(spark, _url(tmp_path), 'x"; DROP TABLE t--', driver=_DRV)


def test_overwrite_swap_survives_stale_swap_table(spark, tmp_path):
    """A stale __swap from a crashed overwrite is dropped, not merged."""
    url = _url(tmp_path)
    sink = JdbcSinkTable(spark, url, "t", driver=_DRV)
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    sink.append(df)
    # simulate a crash that left a populated swap table behind
    stale = spark.createDataFrame([(99, "stale")], "id long, name string")
    from basic_data_pipeline_spark.sources.files import write_jdbc

    write_jdbc(stale, url, "t__swap", mode="append", driver=_DRV)
    sink.overwrite(spark.createDataFrame([(2, "b")], "id long, name string"))
    got = [(r["id"], r["name"]) for r in sink.read().collect()]
    assert got == [(2, "b")]


def test_sql_type_mapping_refuses_unmappable():
    from pyspark.sql import types as T

    assert jdbc_sink._sql_type(T.DecimalType(12, 3)) == "DECIMAL(12,3)"
    with pytest.raises(JdbcUnavailable):
        jdbc_sink._sql_type(T.ArrayType(T.IntegerType()))
