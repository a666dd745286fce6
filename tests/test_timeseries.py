"""Gap filling (operators/timeseries.py) — pinned against a serial
Python reference over hand-built sparse series."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import timeseries as TS

BS = 3600  # 1-hour buckets


def _series(spark):
    rows = [
        # key 'a': observations at buckets 0, 3, 4 (of 0..5)
        ("a", 0 * BS, 10.0),
        ("a", 3 * BS, 40.0),
        ("a", 4 * BS, 20.0),
        # key 'b': single observation in the middle
        ("b", 2 * BS, 5.0),
    ]
    return spark.createDataFrame(rows, "k string, b long, v double")


BOUNDS = (0, 5 * BS)


def _collect(df):
    return {
        (r["k"], r["b"]): (r["v"], r["filled"]) for r in df.collect()
    }


def test_gapfill_grid_is_dense(spark):
    out = TS.gapfill(_series(spark), "k", "b", "v", BS, "null", BOUNDS)
    got = _collect(out)
    assert len(got) == 2 * 6
    assert got[("a", 0)] == (10.0, False)
    assert got[("a", BS)] == (None, True)


def test_gapfill_locf(spark):
    got = _collect(
        TS.gapfill(_series(spark), "k", "b", "v", BS, "locf", BOUNDS)
    )
    assert [got[("a", i * BS)][0] for i in range(6)] == [
        10.0, 10.0, 10.0, 40.0, 20.0, 20.0
    ]
    # leading holes stay null; trailing carry forward
    assert [got[("b", i * BS)][0] for i in range(6)] == [
        None, None, 5.0, 5.0, 5.0, 5.0
    ]


def test_gapfill_linear(spark):
    got = _collect(
        TS.gapfill(_series(spark), "k", "b", "v", BS, "linear", BOUNDS)
    )
    assert got[("a", 1 * BS)][0] == pytest.approx(20.0)  # 10 -> 40 at 1/3
    assert got[("a", 2 * BS)][0] == pytest.approx(30.0)
    assert got[("a", 4 * BS)][0] == 20.0  # observed passes through
    # edges (no neighbor on one side) stay null
    assert got[("a", 5 * BS)][0] is None
    assert got[("b", 0)][0] is None and got[("b", 5 * BS)][0] is None


def test_gapfill_zero_and_default_bounds(spark):
    out = TS.gapfill(_series(spark), "k", "b", "v", BS, "zero")
    got = _collect(out)
    # default bounds = global [min, max] observed bucket = [0, 4h]
    assert len(got) == 2 * 5
    assert got[("b", 0)] == (0.0, True)


def test_gapfill_partitioning_invariant(spark):
    s = _series(spark)
    a = _collect(TS.gapfill(s, "k", "b", "v", BS, "linear", BOUNDS))
    b = _collect(
        TS.gapfill(s.repartition(7), "k", "b", "v", BS, "linear", BOUNDS)
    )
    assert a == b


def test_time_bucket_floors_to_epoch_multiple(spark):
    df = spark.createDataFrame(
        [("2024-01-01 10:59:59",), ("2024-01-01 11:00:00",)], "t string"
    ).select(F.to_timestamp("t").alias("ts"))
    got = [r[0] for r in df.select(TS.time_bucket(F.col("ts"), 3600)).collect()]
    assert got[0] + 3600 == got[1]
    assert all(g % 3600 == 0 for g in got)


def test_gapfill_validates(spark):
    s = _series(spark)
    with pytest.raises(ValueError):
        TS.gapfill(s, "k", "b", "v", BS, "cubic")
    with pytest.raises(ValueError):
        TS.gapfill(s, "k", "b", "v", BS, "locf", (1, 2 * BS))


# --- LTTB downsampling ----------------------------------------------------


def _lttb_ref(points, n_out):
    """Serial reference for the parallel-anchor LTTB variant: same
    bucket boundaries (integer division), centroid anchors, argmax by
    (area desc, t asc). Values chosen exactly representable, so float
    vs decimal accumulation cannot differ."""
    pts = sorted(points)
    cnt = len(pts)
    if cnt <= n_out:
        return {(i, t, v) for i, (t, v) in enumerate(pts)}
    buckets = {}
    for rn, (t, v) in enumerate(pts, start=1):
        if rn == 1:
            b = 0
        elif rn == cnt:
            b = n_out - 1
        else:
            b = 1 + ((rn - 2) * (n_out - 2)) // (cnt - 2)
        buckets.setdefault(b, []).append((t, v))
    cent = {
        b: (
            sum(t for t, _ in ps) / len(ps),
            sum(v for _, v in ps) / len(ps),
        )
        for b, ps in buckets.items()
    }
    out = set()
    bs = sorted(buckets)
    for i, b in enumerate(bs):
        prev = cent[bs[i - 1]] if i > 0 else None
        nxt = cent[bs[i + 1]] if i + 1 < len(bs) else None
        best = None
        for t, v in buckets[b]:
            if prev is None or nxt is None:
                area = None
            else:
                area = abs(
                    (prev[0] - nxt[0]) * (v - prev[1])
                    - (prev[0] - t) * (nxt[1] - prev[1])
                )
            key = (-(area if area is not None else float("-inf")), t)
            if best is None or key < best[0]:
                best = (key, (b, t, v))
        out.add(best[1])
    return out


def _wavy(key_seed, n):
    # integer-valued zig-zag with key-dependent spikes: exact in float
    # AND in decimal(38,6), deterministic
    return [
        (
            float(i * 10),
            float((i * (3 + key_seed)) % 17 + (50 if i % 13 == key_seed else 0)),
        )
        for i in range(n)
    ]


def test_lttb_matches_serial_reference(spark):
    rows = []
    for k, n in (("a", 57), ("b", 100), ("c", 8)):
        for t, v in _wavy(ord(k) % 5, n):
            rows.append((k, t, v))
    df = spark.createDataFrame(rows, "k string, t double, v double")
    out = TS.lttb_downsample(df, "k", "t", "v", 12)
    got = {
        k: {(r["bucket"], r["t"], r["v"]) for r in rs}
        for k, rs in _group(out.collect()).items()
    }
    for k, n in (("a", 57), ("b", 100), ("c", 8)):
        ref = _lttb_ref(_wavy(ord(k) % 5, n), 12)
        assert got[k] == ref, k
        # endpoints always survive; size bounded
        ts = sorted(t for _, t, _ in got[k])
        assert ts[0] == 0.0 and ts[-1] == (n - 1) * 10.0
        assert len(got[k]) == min(n, 12)


def _group(rows):
    out = {}
    for r in rows:
        out.setdefault(r["k"], []).append(r)
    return out


def test_lttb_partitioning_invariant(spark):
    rows = [("a", t, v) for t, v in _wavy(2, 64)]
    df = spark.createDataFrame(rows, "k string, t double, v double")
    a = {tuple(r) for r in TS.lttb_downsample(df, "k", "t", "v", 9).collect()}
    b = {
        tuple(r)
        for r in TS.lttb_downsample(
            df.repartition(11), "k", "t", "v", 9
        ).collect()
    }
    assert a == b


def test_lttb_validates(spark):
    df = spark.createDataFrame([("a", 1.0, 1.0)], "k string, t double, v double")
    with pytest.raises(ValueError):
        TS.lttb_downsample(df, "k", "t", "v", 2)


# --- MAD anomalies --------------------------------------------------------


def test_mad_flags_planted_outliers(spark):
    base = [("a", float(i), float(10 + (i % 3))) for i in range(20)]
    rows = base + [("a", 100.0, 99.0), ("a", 101.0, -45.0)]
    # degenerate key: constant but one point off
    rows += [("c", float(i), 7.0) for i in range(10)] + [("c", 99.0, 8.0)]
    df = spark.createDataFrame(rows, "k string, t double, v double")
    got = {
        (r["k"], r["t"]): (r["score"], r["is_anomaly"])
        for r in TS.mad_anomalies(df, "k", "t", "v").collect()
    }
    assert got[("a", 100.0)][1] and got[("a", 101.0)][1]
    assert not any(got[("a", float(i))][1] for i in range(20))
    # MAD=0 key: score null, only the deviating point flagged
    assert got[("c", 99.0)] == (None, True)
    assert got[("c", 0.0)] == (None, False)


def test_mad_matches_numpy(spark):
    import numpy as np

    vals = [float(x) for x in np.random.default_rng(6).integers(0, 50, 41)]
    df = spark.createDataFrame(
        [("a", float(i), v) for i, v in enumerate(vals)],
        "k string, t double, v double",
    )
    got = {
        r["t"]: (r["score"], r["is_anomaly"])
        for r in TS.mad_anomalies(df, "k", "t", "v", threshold=2.0).collect()
    }
    med = float(np.median(vals))
    mad = float(np.median([abs(v - med) for v in vals]))
    for i, v in enumerate(vals):
        score = 0.6745 * (v - med) / mad
        assert got[float(i)][0] == pytest.approx(score, abs=1e-12)
        assert got[float(i)][1] == (abs(score) > 2.0)
