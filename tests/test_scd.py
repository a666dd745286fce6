"""SCD Type 2 maintenance: interval invariants, delete gaps, batch
associativity (incremental == one-shot), and the skip-unchanged
refinement."""

from __future__ import annotations

from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators.scd import scd2_apply

SCHEMA = "id long, name string, city string, ts long, op string"

CHANGES = [
    (1, "ann", "rome", 1, "c"),
    (2, "bob", "oslo", 2, "c"),
    (1, "ann", "pisa", 5, "u"),
    (2, "bob", "oslo", 6, "u"),  # attribute no-op
    (1, None, None, 8, "d"),
    (1, "ann", "bern", 10, "c"),
    (3, "cal", "kiev", 11, "c"),
]


def _hist_rows(h):
    return sorted(
        (
            (
                r["id"],
                r["name"],
                r["city"],
                r["valid_from"],
                r["valid_to"],
                r["is_current"],
            )
            for r in h.collect()
        ),
        key=lambda t: (t[0], t[3]),
    )


def test_scd2_intervals_and_delete_gap(spark):
    ch = spark.createDataFrame(CHANGES, SCHEMA)
    h = scd2_apply(None, ch, ["id"])
    rows = _hist_rows(h)

    k1 = [r for r in rows if r[0] == 1]
    assert [(r[3], r[4], r[5]) for r in k1] == [
        (1, 5, False),   # rome
        (5, 8, False),   # pisa, closed by the delete
        (10, None, True),  # bern re-opens after the gap
    ]
    assert [r[2] for r in k1] == ["rome", "pisa", "bern"]
    # the no-op update still creates a version without skip_unchanged
    k2 = [r for r in rows if r[0] == 2]
    assert [(r[3], r[4]) for r in k2] == [(2, 6), (6, None)]
    # exactly one current row per live key
    cur = [r for r in rows if r[5]]
    assert sorted(r[0] for r in cur) == [1, 2, 3]


def test_scd2_incremental_equals_oneshot(spark):
    ch = spark.createDataFrame(CHANGES, SCHEMA)
    oneshot = scd2_apply(None, ch, ["id"])

    b1 = spark.createDataFrame([c for c in CHANGES if c[3] <= 5], SCHEMA)
    b2 = spark.createDataFrame([c for c in CHANGES if c[3] > 5], SCHEMA)
    inc = scd2_apply(scd2_apply(None, b1, ["id"]), b2, ["id"])
    assert _hist_rows(inc) == _hist_rows(oneshot)


def test_scd2_skip_unchanged(spark):
    ch = spark.createDataFrame(CHANGES, SCHEMA)
    h = scd2_apply(None, ch, ["id"], skip_unchanged=True)
    k2 = [r for r in _hist_rows(h) if r[0] == 2]
    assert [(r[3], r[4], r[5]) for r in k2] == [(2, None, True)], k2

    # and incrementally: the no-op update arriving in a LATER batch must
    # compare against the open history row, not just within-batch lag
    b1 = spark.createDataFrame([c for c in CHANGES if c[3] <= 2], SCHEMA)
    b2 = spark.createDataFrame([c for c in CHANGES if c[3] > 2], SCHEMA)
    inc = scd2_apply(
        scd2_apply(None, b1, ["id"], skip_unchanged=True),
        b2,
        ["id"],
        skip_unchanged=True,
    )
    k2i = [r for r in _hist_rows(inc) if r[0] == 2]
    assert [(r[3], r[4], r[5]) for r in k2i] == [(2, None, True)], k2i


def test_scd2_same_ts_upsert_then_delete_ends_deleted(spark):
    ch = spark.createDataFrame(
        [(7, "zed", "lima", 4, "c"), (7, None, None, 4, "d")], SCHEMA
    )
    h = scd2_apply(None, ch, ["id"])
    rows = _hist_rows(h)
    assert rows == [(7, "zed", "lima", 4, 4, False)]
    assert not [r for r in rows if r[5]]


def test_scd2_same_ts_delete_wins_for_every_upsert_op(spark):
    """CDC op codes are c/u/r/d: a plain op-asc tie-break would order
    'u'/'r' AFTER 'd' and re-open a key a simultaneous delete should have
    closed. The delete must order last regardless of the upsert flavor."""
    for op in ("c", "u", "r"):
        ch = spark.createDataFrame(
            [(7, "zed", "lima", 4, op), (7, None, None, 4, "d")], SCHEMA
        )
        rows = _hist_rows(scd2_apply(None, ch, ["id"]))
        assert rows == [(7, "zed", "lima", 4, 4, False)], (op, rows)
        assert not [r for r in rows if r[5]], op


def test_scd2_untouched_history_unchanged(spark):
    b1 = spark.createDataFrame([(1, "ann", "rome", 1, "c")], SCHEMA)
    b2 = spark.createDataFrame([(9, "new", "baku", 3, "c")], SCHEMA)
    h = scd2_apply(scd2_apply(None, b1, ["id"]), b2, ["id"])
    k1 = [r for r in _hist_rows(h) if r[0] == 1]
    assert k1 == [(1, "ann", "rome", 1, None, True)]
