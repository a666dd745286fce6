"""Atomically-swapped parquet state store with an epoch watermark.

The shared machinery for foreachBatch sinks whose state must be
REPLACED (not appended) each micro-batch — SCD2 history
(streaming/scd_stream.py) and the continuous rollup
(streaming/rollup_stream.py). foreachBatch is at-least-once; replaying a
batch against state that already contains it would double-apply, so:

* the epoch watermark is written INSIDE the new state directory before
  the rename — data and epoch move atomically;
* replayed epoch ≤ the stored watermark → the batch is skipped outright;
* crash BEFORE the rename → old state + old watermark intact; the
  replay re-applies against unmodified state (correct);
* crash BETWEEN rmtree and rename (the one non-atomic window) → the
  completed temp dir is recovered by `recover` on the next batch;
* a leftover temp dir NEXT TO live state is an incomplete write —
  discarded; the replay re-applies from the authoritative old state.

Spark readers ignore underscore-prefixed files, so the meta JSON rides
inside the data directory without affecting scans. The swap is atomic on
a real filesystem; object stores would use a commit protocol instead.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame


def meta_path(state_path: str, meta_name: str) -> str:
    return os.path.join(state_path, meta_name)


def tmp_path(state_path: str) -> str:
    return f"{state_path}.tmp-swap"


def read_watermark(state_path: str, tag: str, meta_name: str) -> int:
    try:
        with open(meta_path(state_path, meta_name)) as f:
            return json.load(f).get(tag, -1)
    except FileNotFoundError:
        return -1


def has_data(state_path: str) -> bool:
    return bool(
        glob.glob(os.path.join(state_path, "**", "*.parquet"), recursive=True)
    )


def recover(state_path: str) -> None:
    """Finish or roll back an interrupted swap (see module docstring)."""
    tmp = tmp_path(state_path)
    if not os.path.exists(tmp):
        return
    if os.path.exists(state_path):
        shutil.rmtree(tmp)
    else:
        os.rename(tmp, state_path)


def advance_watermark(state_path: str, epoch_id: int, tag: str, meta_name: str) -> None:
    """Record a completed (but state-identical) epoch without paying a
    rewrite — e.g. an empty batch. The meta replace is atomic."""
    meta = {}
    try:
        with open(meta_path(state_path, meta_name)) as f:
            meta = json.load(f)
    except FileNotFoundError:
        pass
    meta[tag] = epoch_id
    os.makedirs(state_path, exist_ok=True)
    tmp = meta_path(state_path, meta_name) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path(state_path, meta_name))


def swap_in(
    new_state: DataFrame,
    state_path: str,
    epoch_id: int,
    tag: str,
    meta_name: str,
) -> None:
    """Write the new state to a temp dir (watermark inside), then swap it
    over the old state."""
    tmp = tmp_path(state_path)
    new_state.write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, meta_name), "w") as f:
        json.dump({tag: epoch_id}, f)
    if os.path.exists(state_path):
        shutil.rmtree(state_path)
    os.rename(tmp, state_path)
