"""Slowly-changing-dimension Type 2 maintenance from CDC change batches.

The reference's sink keeps only the latest row per key (ClickHouse
ReplacingMergeTree semantics via consumer_to_file.py's per-key upserts);
an analytics warehouse usually also wants the HISTORY — every version of
a dimension row with its validity interval. This operator folds a batch
of CDC changes (op ∈ c/u/r = upsert, d = delete, as in operators/cdc.py)
into an SCD2 history table:

    key cols…, attr cols…, valid_from, valid_to (NULL = open), is_current

Set-based, no per-row loop: all versions a batch creates are derived with
ONE window per key (valid_to = the next change's timestamp via lead);
previously-open history rows of touched keys are closed by a join against
each key's first change timestamp. Cost per batch: one shuffle of the
CHANGE batch by key plus one keyed join against the history — the history
is never rewritten beyond the touched keys' open rows, which is the
property that matters when the history is 100 TB and the batch is
megabytes: partition the stored history by key so the join prunes.

Delete semantics: a delete closes the key's current version at the
delete's timestamp and creates no new version; a later upsert re-opens
the key with a fresh interval (gap in validity = the key did not exist).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

DELETE_OP = "d"


def scd2_apply(
    history: DataFrame | None,
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    op_col: str = "op",
    skip_unchanged: bool = False,
) -> DataFrame:
    """Fold one CDC batch into the SCD2 history; returns the new history.

    `changes` columns: key_cols + attribute columns + `ts_col` + `op_col`.
    `history` is a prior return value (or None to start). Within a batch,
    changes to the same key are ordered by (`ts_col`); ties broken by op
    so a delete at the same timestamp as an upsert closes AFTER it
    (deterministic, documented: simultaneous upsert+delete = key ends
    deleted).

    `skip_unchanged=True` drops upserts whose attributes equal the key's
    previous version (within the batch via lag; against the incoming open
    history row for the first change of each key) — the standard "only
    real changes make versions" refinement.

    Precondition (the same one every SCD2 merge has): batches arrive in
    per-key timestamp order — a batch must not contain changes OLDER than
    the history's open row for that key (CDC sources guarantee this via
    per-key partition ordering; Kafka keys by primary key). A violation
    produces a version whose valid_to precedes its valid_from rather than
    silent reordering, so it is detectable downstream with one interval
    scan."""
    attr_cols = [
        c for c in changes.columns if c not in (*key_cols, ts_col, op_col)
    ]
    # Deletes order explicitly LAST among same-ts changes: ops are c/u/r/d
    # and a plain op-asc sort would put 'u'/'r' AFTER 'd' (re-opening a key
    # a simultaneous delete should have closed). The delete flag dominates,
    # then op code for full determinism among the upsert flavors.
    order = [
        F.col(ts_col).asc(),
        (F.col(op_col) == DELETE_OP).cast("int").asc(),
        F.col(op_col).asc(),
    ]
    wk = W.partitionBy(*key_cols).orderBy(*order)

    ch = changes
    if skip_unchanged and history is not None:
        open_prev = history.filter(F.col("is_current")).select(
            *key_cols,
            *[F.col(c).alias(f"_prev_{c}") for c in attr_cols],
        )
        first_rn = F.row_number().over(wk)
        ch = (
            ch.withColumn("_rn", first_rn)
            .join(open_prev, key_cols, "left")
            .withColumn(
                "_same_as_open",
                (F.col("_rn") == 1)
                & F.struct(*attr_cols).eqNullSafe(
                    F.struct(*[F.col(f"_prev_{c}") for c in attr_cols])
                ),
            )
            .drop("_rn", *[f"_prev_{c}" for c in attr_cols])
        )
    else:
        ch = ch.withColumn("_same_as_open", F.lit(False))
    if skip_unchanged:
        prev_attrs = F.lag(F.struct(*attr_cols)).over(wk)
        prev_op = F.lag(F.col(op_col)).over(wk)
        same_as_lag = (
            prev_attrs.isNotNull()
            & (prev_op != DELETE_OP)
            & F.struct(*attr_cols).eqNullSafe(prev_attrs)
        )
        ch = ch.withColumn(
            "_skip",
            (F.col(op_col) != DELETE_OP)
            & (F.coalesce(same_as_lag, F.lit(False)) | F.col("_same_as_open")),
        ).filter(~F.col("_skip"))
    ch = ch.drop("_same_as_open", "_skip") if skip_unchanged else ch.drop(
        "_same_as_open"
    )

    # each surviving change closes at the NEXT surviving change's ts
    versioned = (
        ch.withColumn("_next_ts", F.lead(F.col(ts_col)).over(wk))
        .withColumn("_first_ts", F.first(F.col(ts_col)).over(wk))
    )
    new_rows = versioned.filter(F.col(op_col) != DELETE_OP).select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.col("_next_ts").alias("valid_to"),
        F.col("_next_ts").isNull().alias("is_current"),
    )

    if history is None:
        return new_rows

    # close previously-open rows of touched keys at the key's first change
    firsts = versioned.groupBy(*key_cols).agg(
        F.min("_first_ts").alias("_close_ts")
    )
    closed = (
        history.join(F.broadcast(firsts), key_cols, "left")
        .withColumn(
            "valid_to",
            F.when(
                F.col("is_current") & F.col("_close_ts").isNotNull(),
                F.col("_close_ts"),
            ).otherwise(F.col("valid_to")),
        )
        .withColumn(
            "is_current",
            F.col("is_current") & F.col("_close_ts").isNull(),
        )
        .drop("_close_ts")
    )
    return closed.unionByName(new_rows)
