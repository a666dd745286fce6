"""Property-based tests (hypothesis): the invariants example-based tests
can't sweep — arbitrary value normalization, random CDC op interleavings,
as-of joins vs pandas' reference merge_asof.

Each property batches all generated cases into ONE DataFrame per example
(a Spark job per row would be pathological); max_examples stays small
because every example is a full Spark plan.
"""

from __future__ import annotations

import json

import pandas as pd
import pytest

#: slow tier (r12): hypothesis invariant sweeps; example-based pins of the same invariants run by default
pytestmark = pytest.mark.slow
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from basic_data_pipeline_spark.functions.normalize import normalize_string_value
from basic_data_pipeline_spark.operators.asof import asof_join
from basic_data_pipeline_spark.operators.cdc import compact_latest
from basic_data_pipeline_spark.sources.envelopes import (
    employee_workload,
    envelopes_to_df,
    expected_final_state,
)
from basic_data_pipeline_spark.streaming.ingest import run_batches


def normalize_reference(v: str | None) -> str:
    """Imperative reference of the consumer's normalize_value
    (consumer_to_file.py:88-113) restricted to the string-envelope domain
    our pipeline sees."""
    if v is None:
        return ""
    t = v.strip()
    low = t.lower()
    if low == "true":
        return "1"
    if low == "false":
        return "0"
    import re
    from decimal import Decimal

    if re.fullmatch(r"-?\d+(\.\d+)?", t) and float(t) > 1e12:
        return str(int(Decimal(t) // 1000))
    return v


_VALUES = st.one_of(
    st.none(),
    st.just("true"),
    st.just("false"),
    st.integers(min_value=-(10**15), max_value=10**15).map(str),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
        max_size=40,
    ),
    st.dictionaries(st.text(max_size=5), st.integers(), max_size=3).map(json.dumps),
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_VALUES, min_size=1, max_size=60))
def test_normalize_matches_reference(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [
        r["n"] for r in df.select(normalize_string_value(F.col("v")).alias("n")).collect()
    ]
    expected = [normalize_reference(v) for v in values]
    assert got == expected


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    seed=st.integers(min_value=0, max_value=2**31),
    n_snapshot=st.integers(min_value=0, max_value=10),
    n_ops=st.integers(min_value=1, max_value=60),
    n_batches=st.integers(min_value=1, max_value=4),
)
def test_cdc_compact_any_interleaving(spark, tmp_path_factory, seed, n_snapshot, n_ops, n_batches):
    """For ANY random op sequence and ANY batch split, compacted state ==
    the imperative replay oracle."""
    wl = employee_workload(n_snapshot=n_snapshot, n_ops=n_ops, seed=seed)
    size = max(1, len(wl) // n_batches)
    batches = [
        envelopes_to_df(spark, wl[i : i + size]) for i in range(0, len(wl), size)
    ]
    sink_root = str(tmp_path_factory.mktemp("cdc_prop"))
    sinks = run_batches(spark, batches, sink_root, mode="compact")
    expected = expected_final_state(wl)
    if "employees" not in sinks or sinks["employees"].record_schema is None:
        assert not expected
        return
    got = {r["id"] for r in sinks["employees"].read().collect()}
    assert got == set(expected)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=40
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.floats(0, 10)),
        min_size=1,
        max_size=40,
    ),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    # dedupe right per (key, ts) — asof_join's documented precondition
    rdedup = {}
    for k, t, v in right:
        rdedup[(k, t)] = max(v, rdedup.get((k, t), float("-inf")))
    rrows = [(k, t, v) for (k, t), v in sorted(rdedup.items())]

    ldf = spark.createDataFrame(left, "key long, ts long")
    rdf = spark.createDataFrame(rrows, "key long, ts long, v double")
    got = {
        (r["key"], r["ts"]): r["v_asof"]
        for r in asof_join(ldf, rdf, "key", "ts", ["v"]).collect()
    }

    lpd = pd.DataFrame(left, columns=["key", "ts"]).sort_values("ts", kind="stable")
    rpd = pd.DataFrame(rrows, columns=["key", "ts", "v"]).sort_values("ts", kind="stable")
    merged = pd.merge_asof(lpd, rpd, on="ts", by="key", direction="backward")
    for row in merged.itertuples():
        exp = None if pd.isna(row.v) else row.v
        assert got[(row.key, row.ts)] == exp


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 50), st.integers(0, 1000)),
        min_size=1,
        max_size=60,
    )
)
def test_compact_latest_keeps_exactly_latest(spark, rows):
    """compact_latest == imperative last-write-wins for any (key, version)
    multiset."""
    df = spark.createDataFrame(rows, "k long, ver long, payload long")
    got = {
        r["k"]: (r["ver"], r["payload"])
        for r in compact_latest(df, key="k", order_cols=["ver", "payload"]).collect()
    }
    expected: dict[int, tuple[int, int]] = {}
    for k, ver, payload in rows:
        if k not in expected or (ver, payload) > expected[k]:
            expected[k] = (ver, payload)
    assert got == expected
