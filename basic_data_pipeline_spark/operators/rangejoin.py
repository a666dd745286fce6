"""Binned range join: point-in-interval joins without an equi key.

The reference's SQL surface exposes range predicates (BETWEEN theta
joins); Spark plans a pure range join — no equality component at all —
as BroadcastNestedLoopJoin (small side) or a cartesian product, both
O(|L|·|R|): a non-starter at 100 TB. Commercial engines special-case
this ("range join optimization"); open-source Spark needs the standard
manual rewrite, which this operator packages:

1. pick a bin width W over the point/interval domain;
2. each LEFT row (a point p) lands in exactly ONE bin floor(p/W);
3. each RIGHT row (an interval [lo, hi]) is replicated to every bin it
   overlaps — explode over sequence(floor(lo/W), floor(hi/W));
4. equi-join on the bin id (hash/sort-merge — shuffles, partitions,
   and scales like any other key join), then re-apply the exact
   BETWEEN as a residual filter.

Because a point belongs to exactly one bin, a matching (left, right)
pair meets in exactly one bin — the join needs NO post-dedup. Cost is
|L| + Σ_right ceil(len/W + 1) join-input rows: W tunes replication
(small W → more right copies, better selectivity per bin; large W →
fewer copies, bigger residual filter). For intervals much shorter than
W the replication factor is ≤ 2.

The same rewrite under AQE inherits skew-join splitting for hot bins;
an adversarially hot bin can additionally be salted by compounding the
bin key with a hash of the left point (not needed at fixture scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str | Column,
    right_lo: str | Column,
    right_hi: str | Column,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Rows of `left` × `right` where right_lo <= left_point <= right_hi,
    as an EQUI-join on bin ids (see module docstring). Output columns:
    all of `left`'s then all of `right`'s (names must not collide —
    alias/prefix beforehand, as with any Spark join). `how` supports
    'inner' and 'left_semi'.

    NULL bounds follow SQL BETWEEN semantics (unknown → no match):
    null-lo/hi intervals and null points are dropped before the join.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"unsupported how={how!r}")
    lp = F.col(left_point) if isinstance(left_point, str) else left_point
    lo = F.col(right_lo) if isinstance(right_lo, str) else right_lo
    hi = F.col(right_hi) if isinstance(right_hi, str) else right_hi

    lbin = F.floor(lp / F.lit(bin_width))
    l_tagged = left.where(lp.isNotNull()).withColumn("_rj_bin", lbin)
    r_tagged = (
        right.where(lo.isNotNull() & hi.isNotNull() & (lo <= hi))
        .withColumn(
            "_rj_bin",
            F.explode(
                F.sequence(
                    F.floor(lo / F.lit(bin_width)),
                    F.floor(hi / F.lit(bin_width)),
                )
            ),
        )
    )
    residual = (lp >= lo) & (lp <= hi)
    joined = l_tagged.join(r_tagged, "_rj_bin", "inner").where(residual)
    if how == "left_semi":
        # a point can match an interval in exactly one bin, so distinct
        # left rows ARE the semi-join result
        return joined.select(*left.columns).distinct()
    return joined.drop("_rj_bin")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str | Column,
    left_hi: str | Column,
    right_lo: str | Column,
    right_hi: str | Column,
    bin_width: float,
) -> DataFrame:
    """Interval × interval overlap ([l_lo, l_hi] ∩ [r_lo, r_hi] ≠ ∅) via
    the same binning: both sides replicate to their overlapped bins, the
    equi-join on bin finds every overlapping pair, and — because two
    overlapping intervals share every bin covering the overlap — the
    canonical bin trick dedups without a distinct: keep the pair only in
    the FIRST bin both occupy, floor(greatest(l_lo, r_lo)/W). One keyed
    equi-join, no n² pair space, no post-distinct shuffle."""
    llo = F.col(left_lo) if isinstance(left_lo, str) else left_lo
    lhi = F.col(left_hi) if isinstance(left_hi, str) else left_hi
    rlo = F.col(right_lo) if isinstance(right_lo, str) else right_lo
    rhi = F.col(right_hi) if isinstance(right_hi, str) else right_hi

    def tag(df: DataFrame, lo: Column, hi: Column) -> DataFrame:
        return df.where(lo.isNotNull() & hi.isNotNull() & (lo <= hi)).withColumn(
            "_rj_bin",
            F.explode(
                F.sequence(
                    F.floor(lo / F.lit(bin_width)),
                    F.floor(hi / F.lit(bin_width)),
                )
            ),
        )

    overlap = (llo <= rhi) & (rlo <= lhi)
    canonical = F.col("_rj_bin") == F.floor(
        F.greatest(llo, rlo) / F.lit(bin_width)
    )
    return (
        tag(left, llo, lhi)
        .join(tag(right, rlo, rhi), "_rj_bin", "inner")
        .where(overlap & canonical)
        .drop("_rj_bin")
    )
