"""Single-pass data-quality profiling and declarative expectation checks.

The reference pipeline validates rows one at a time while re-inserting
them over HTTP (consumer_to_file.py:226-235) and has no table-level
quality surface at all. At 100 TB the only affordable shape is ONE full
scan that computes EVERY metric at once with map-side partial
aggregation — the design popularized by Deequ/Great Expectations, here
expressed as plain Spark aggregates so Catalyst fuses the whole profile
into a single WholeStageCodegen pass over the scan.

* ``profile_columns`` — per-column completeness/cardinality/bounds in one
  job: each requested column contributes a fixed bundle of aggregate
  expressions to a single ``df.agg(...)``; the 1-row wide result is then
  unpivoted JVM-side (``stack``) into one tidy row per column. Cost is
  one scan + one O(#cols) driver-free reshape, independent of row count.
  Exact ``count(DISTINCT)`` per column is an expand-based plan (×#cols
  data duplication in the shuffle), so cardinality defaults to
  ``approx_count_distinct`` (HLL, mergeable, one pass) and exactness is
  an explicit opt-in for oracle-sized data.

* ``check_constraints`` — declarative expectations evaluated in the SAME
  single-aggregation shape: every check compiles to a conditional count
  (`completeness`, `in_range`, `accepted_values`, arbitrary boolean
  ``condition``) or a countDistinct (`unique`), all folded into one
  ``agg``; verdicts (observed fraction vs required minimum) come out as
  a tidy DataFrame with zero driver-side arithmetic. A failed check is
  data, not an exception — callers decide whether to gate the pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_NUMERIC = {
    "tinyint", "smallint", "int", "bigint", "float", "double", "long",
    "integer", "short", "byte",
} | {f"decimal({p},{s})" for p in range(1, 39) for s in range(0, 19)}


def _is_numeric(dtype: str) -> bool:
    return dtype in _NUMERIC or dtype.startswith("decimal")


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = False,
    rsd: float | None = None,
) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_value, max_value,
    avg_value): one tidy profile row per requested column, computed in a
    SINGLE aggregation pass over ``df``.

    ``min_value``/``max_value`` are cast to string so heterogeneous
    column types share one schema; ``avg_value`` is NULL for
    non-numeric columns. ``n_distinct`` counts non-null values and is
    approximate (HLL) unless ``exact_distinct`` — see module docstring
    for the scale rationale. ``rsd`` loosens the HLL relative error
    (Spark default 0.05); 0.10 shaves ~12% off the distinct-count term
    at scale (measured, SCALING.md round-7 attribution) when a coarse
    cardinality is enough.
    """
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    # Index-based internal aliases + pure Column API throughout — no SQL
    # strings embed user-supplied names, so any column name (spaces,
    # quotes, backticks) profiles cleanly.
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        col = df[c]
        nd = (
            F.countDistinct(col)
            if exact_distinct
            else F.approx_count_distinct(col, rsd)
            if rsd is not None
            else F.approx_count_distinct(col)
        )
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"__null_{i}"),
            nd.alias(f"__nd_{i}"),
            F.min(col).cast("string").alias(f"__min_{i}"),
            F.max(col).cast("string").alias(f"__max_{i}"),
            (
                F.avg(col.cast("double"))
                if _is_numeric(dtypes.get(c, ""))
                else F.lit(None).cast("double")
            ).alias(f"__avg_{i}"),
        ]
    wide = df.agg(*aggs)
    # Unpivot the 1-row wide frame into one row per column, JVM-side
    # (explode of a struct array — the Column-API form of stack()).
    tall = wide.select(
        F.col("__n").alias("n_rows"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"__null_{i}").alias("n_null"),
                        F.col(f"__nd_{i}").alias("n_distinct"),
                        F.col(f"__min_{i}").alias("min_value"),
                        F.col(f"__max_{i}").alias("max_value"),
                        F.col(f"__avg_{i}").alias("avg_value"),
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("_m"),
    )
    return tall.select(
        "_m.column", "n_rows", "_m.n_null", "_m.n_distinct",
        "_m.min_value", "_m.max_value", "_m.avg_value",
    )


@dataclass(frozen=True)
class Check:
    """One declarative expectation.

    ``kind`` is ``condition`` (fraction of rows where ``cond`` holds must
    be ≥ ``min_fraction``; NULL counts as failing) or ``unique`` (the
    distinct count of ``unique_cols`` tuples must equal the row count —
    evaluated exactly, since an approximate uniqueness verdict is
    useless).
    """

    name: str
    kind: str = "condition"
    cond: Column | None = None
    unique_cols: tuple[str, ...] = ()
    min_fraction: float = 1.0


def not_null(name: str, col: str, min_fraction: float = 1.0) -> Check:
    return Check(name, cond=F.col(col).isNotNull(), min_fraction=min_fraction)


def in_range(
    name: str, col: str, lo, hi, min_fraction: float = 1.0
) -> Check:
    return Check(
        name, cond=F.col(col).between(F.lit(lo), F.lit(hi)),
        min_fraction=min_fraction,
    )


def accepted_values(
    name: str, col: str, values: list, min_fraction: float = 1.0
) -> Check:
    return Check(
        name, cond=F.col(col).isin(values), min_fraction=min_fraction
    )


def condition(name: str, cond: Column, min_fraction: float = 1.0) -> Check:
    return Check(name, cond=cond, min_fraction=min_fraction)


def unique(name: str, *cols: str) -> Check:
    return Check(name, kind="unique", unique_cols=tuple(cols))


def check_constraints(df: DataFrame, checks: list[Check]) -> DataFrame:
    """(check, n_rows, n_pass, pass_fraction, passed): one verdict row
    per expectation, all computed in ONE aggregation over ``df``.

    ``n_pass`` counts rows satisfying the condition (NULL-safe: NULL
    fails) — for ``unique`` checks it is the exact distinct tuple count.
    ``passed`` is ``pass_fraction >= min_fraction`` evaluated JVM-side,
    so the whole verdict table is reproducible data with no driver math.
    """
    if not checks:
        raise ValueError("need at least one check")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names in {names}")
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, ck in enumerate(checks):
        if ck.kind == "unique":
            if not ck.unique_cols:
                raise ValueError(f"{ck.name}: unique check needs columns")
            aggs.append(
                F.countDistinct(*[F.col(c) for c in ck.unique_cols]).alias(
                    f"__p_{i}"
                )
            )
        elif ck.kind == "condition":
            if ck.cond is None:
                raise ValueError(f"{ck.name}: condition check needs cond")
            aggs.append(
                F.sum(
                    F.coalesce(ck.cond.cast("long"), F.lit(0))
                ).alias(f"__p_{i}")
            )
        else:
            raise ValueError(f"{ck.name}: unknown check kind {ck.kind!r}")
    wide = df.agg(*aggs)
    tall = wide.select(
        F.col("__n").alias("n_rows"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ck.name).alias("check"),
                        F.col(f"__p_{i}").alias("n_pass"),
                        F.lit(float(ck.min_fraction))
                        .cast("double")
                        .alias("min_fraction"),
                    )
                    for i, ck in enumerate(checks)
                ]
            )
        ).alias("_m"),
    ).select("n_rows", "_m.check", "_m.n_pass", "_m.min_fraction")
    frac = F.when(F.col("n_rows") == 0, F.lit(1.0)).otherwise(
        F.col("n_pass") / F.col("n_rows")
    )
    return tall.select(
        "check",
        "n_rows",
        F.col("n_pass").cast("long").alias("n_pass"),
        frac.alias("pass_fraction"),
        (frac >= F.col("min_fraction")).alias("passed"),
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """(op, <key_cols...>): row-level diff of two snapshots sharing a
    schema — ``added`` (key only in ``new``), ``removed`` (key only in
    ``old``), ``changed`` (key in both, any non-key column differs).

    One full outer equi-join on the key plus a null-safe row-hash
    comparison of the non-key columns: linear, one shuffle per side, no
    row-by-row reconciliation. The non-key comparison hashes a
    canonical string fold of the value columns (null-safe ``<=>`` is the
    semantics; the hash keeps the join payload narrow at 100 TB — two
    64-bit values per row instead of every column twice)."""
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"schema mismatch: {sorted(old.columns)} vs {sorted(new.columns)}"
        )
    val_cols = [c for c in old.columns if c not in key_cols]

    def hashed(df: DataFrame, side: str) -> DataFrame:
        h = F.xxhash64(
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in val_cols]
        ) if val_cols else F.lit(0)
        return df.select(
            *[F.col(c) for c in key_cols], h.alias(f"_h_{side}"),
            F.lit(1).alias(f"_in_{side}"),
        )

    j = hashed(old, "old").join(hashed(new, "new"), key_cols, "full_outer")
    op = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
    )
    return (
        j.select(op.alias("op"), *key_cols)
        .filter(F.col("op").isNotNull())
    )


def psi_drift(
    a: DataFrame,
    b: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """(bin, frac_a, frac_b, psi_term): Population Stability Index terms
    for ``col`` between snapshot ``a`` (expected) and ``b`` (observed)
    over ``bins`` equal-width buckets spanning [lo, hi]; values outside
    clamp to the edge buckets so both snapshots always share a bucket
    domain. ``sum(psi_term)`` is the PSI (rule of thumb: <0.1 stable,
    >0.25 drifted).

    Two independent single-pass bucket counts (map-side combined,
    ``bins`` output rows each) and one tiny join — no pass ever holds
    more than ``bins`` rows of state per task, so drift monitoring costs
    two scans regardless of table size. Fixed [lo, hi] keeps bucket
    edges identical across snapshots/days — quantile-adaptive edges
    would silently change the metric's meaning between runs."""
    if bins < 1 or hi <= lo:
        raise ValueError("need bins >= 1 and hi > lo")
    width = (hi - lo) / bins

    def bucket_fracs(df: DataFrame, out: str) -> DataFrame:
        bucket = F.least(
            F.greatest(
                F.floor((F.col(col).cast("double") - lo) / width), F.lit(0)
            ),
            F.lit(bins - 1),
        ).cast("int")
        counts = (
            df.filter(F.col(col).isNotNull())
            .groupBy(bucket.alias("bin"))
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        # Global-window normalization over the BUCKET COUNTS (≤ bins
        # rows), not the data — the single-partition exchange here moves
        # `bins` rows, a constant.
        total = F.sum("_c").over(W.partitionBy())
        return counts.select("bin", (F.col("_c") / total).alias(out))

    fa = bucket_fracs(a, "frac_a")
    fb = bucket_fracs(b, "frac_b")
    j = fa.join(fb, "bin", "full_outer").select(
        "bin",
        F.coalesce("frac_a", F.lit(0.0)).alias("frac_a"),
        F.coalesce("frac_b", F.lit(0.0)).alias("frac_b"),
    )
    pa = F.greatest(F.col("frac_a"), F.lit(eps))
    pb = F.greatest(F.col("frac_b"), F.lit(eps))
    return j.select(
        "bin", "frac_a", "frac_b",
        ((pb - pa) * F.log(pb / pa)).alias("psi_term"),
    )
