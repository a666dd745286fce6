"""Snapshot-consistent reads for the incremental index family (r10
verdict item #4).

Every incremental index enforces a SINGLE WRITER (the swapstore lease),
but reader isolation was retrieval-only (`index_search(...,
as_of_completed=True)`, operators/incremental_retrieval.py): an external
reader concurrent with an in-flight append on the dedup / substring /
entity / image / audio / graph indexes could observe a PARTIAL epoch —
some tables already appended, others (and the ledger advance) not yet.

The isolation mechanism is the same id watermark the crash rebuild uses
(streaming/rebuild.py): ids are globally unique and MONOTONE across
batches, the build records the base corpus's ``max_id`` in _meta.json,
and the guarded stream records the running ``max_id`` in the ledger ON
EPOCH COMPLETION only. So every row of a COMPLETED epoch has
id ≤ watermark and every row of an in-flight (or crashed) append has
id > watermark: one codegen filter per table pins a read to exactly the
index content as of the last completed epoch. No locks, no extra pass —
the parquet files being appended are new files, and Spark's scan lists
files at query planning, so the filter is the only coordination needed.

Semantics note (same as retrieval's flag): the watermark advances on
STREAM epoch completion; direct batch mutators don't move it, so an
as-of read taken during interleaved batch appends pins to the last
completed STREAM state. Batch mutators hold the writer lease for their
full duration — a reader that must include batch appends simply reads
unpinned after the mutator returns.

Per family, the pinned columns mirror the rebuild cuts exactly
(rebuild.py module docstring): dedup bands/shingles on the id column,
substring grams on the first-occurrence ``doc``, entity strings on
``id`` + aliases on the epoch tag, images bands / audio fps on the id
column, graph edges on ``src`` + labels/merges on ``_wm``.
"""

from __future__ import annotations

import json
import os

__all__ = ["completed_id_watermark", "require_watermark", "last_completed_epoch"]

_LEDGER = "_stream_ledger.json"


def completed_id_watermark(index_path: str, meta: dict) -> int | None:
    """The id watermark of the last COMPLETED state: the build-time base
    ``max_id`` raised by every ledger tag's completed-epoch ``max_id``.
    None when the index predates watermark recording and no stream epoch
    ever completed."""
    wm = meta.get("max_id")
    lp = os.path.join(index_path, _LEDGER)
    if os.path.exists(lp):
        with open(lp) as f:
            for state in json.load(f).values():
                if isinstance(state, dict) and state.get("max_id") is not None:
                    m = state["max_id"]
                    wm = m if wm is None else max(wm, m)
    return wm


def require_watermark(index_path: str, meta: dict) -> int:
    wm = completed_id_watermark(index_path, meta)
    if wm is None:
        raise ValueError(
            "as_of_completed needs an id watermark: the index predates "
            "watermark recording and no stream epoch has completed"
        )
    return wm


def last_completed_epoch(index_path: str) -> int:
    """Max completed epoch across ledger tags (-1 when none) — the cut
    for epoch-tagged side tables (entity aliases)."""
    last = -1
    lp = os.path.join(index_path, _LEDGER)
    if os.path.exists(lp):
        with open(lp) as f:
            for state in json.load(f).values():
                if isinstance(state, dict):
                    last = max(last, state.get("last_epoch", -1))
    return last
