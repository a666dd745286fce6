"""Per-arm nonemptiness guard (r9 verdict item #1).

A tag-union oracle slot can hash-match while an arm is EMPTY ON BOTH
SIDES — the DuckDB compare certifies empty-vs-empty. That happened twice
before this contract existed: `sim_topk_methods[bm25]` (r8-r9: the 0.5
max-df cut emptied both engines' term sets) and `cdc_delete_apply
[delete_apply]` (r4-r9: every fixture user had an error event, so the
anti-join kept nothing — found the day this file was written). The
contract lives in registry.ARM_CONTRACT; this test runs every declared
slot at the GATE's scale factor (sf0.01 — the sf the driver's
correctness round uses) and fails if any declared arm is below its
floor, any undeclared arm appears, or the tag column is missing.

Slots NOT in ARM_CONTRACT are single-shape; their total-rows floor is
enforced on every tools/compare.py drive (which audits all 50 slots from
its already-collected rows and emits ARM_AUDIT json per round) — running
the other 32 here too would double the compare for no new signal.
"""

from __future__ import annotations

import pytest

from basic_data_pipeline_spark import registry

SF_CORRECT = "/root/testdata/sf0.01"  # the driver gate's sf (conftest.SF_CORRECT)


def test_contract_slots_are_registered():
    assert set(registry.ARM_CONTRACT) <= set(registry.CANONICAL_ORDER)
    for name, (tag_col, floors) in registry.ARM_CONTRACT.items():
        assert floors, f"{name}: empty floor dict"
        assert all(f >= 1 for f in floors.values()), name


def test_audit_flags_vacuous_arm():
    # empty-on-both-sides must be a FAILURE, not a hash match
    cols = ["method", "k"]
    rows = [("brute", 1), ("blocked", 2)]  # bm25/rrf/sq8/audiomatch absent
    problems = registry.audit_arm_rows("sim_topk_methods", cols, rows)
    assert any("bm25" in p and "VACUOUS" in p for p in problems)


def test_audit_flags_undeclared_arm():
    cols = ["kind", "v"]
    rows = [(k, 0) for k in ("anti", "semi", "brand_new")]
    problems = registry.audit_arm_rows("join_semi_anti", cols, rows)
    assert any("undeclared" in p and "brand_new" in p for p in problems)


def test_audit_passes_clean_slot():
    cols = ["flavor", "v"]
    rows = [(k, 0) for k in ("full", "inner", "left")]
    assert registry.audit_arm_rows("join_flavors", cols, rows) == []


@pytest.mark.parametrize("name", sorted(registry.ARM_CONTRACT))
def test_every_declared_arm_nonempty_at_gate_sf(spark, name):
    fn = registry.queries()[name]
    df = fn(spark, SF_CORRECT)
    rows = df.collect()
    problems = registry.audit_arm_rows(name, df.columns, rows)
    assert not problems, "; ".join(problems)


def test_audit_tolerates_non_string_tag_values():
    """A None (or other non-string) tag value alongside strings is exactly
    the anomaly the audit must SURFACE — sorted() over the raw mixed set
    would raise TypeError and crash the compare drive instead (r10
    ADVICE). The violation string must name the stray value."""
    from basic_data_pipeline_spark.registry import audit_arm_rows

    rows = [("semi", 1), ("anti", 2), (None, 3), (7, 4)]
    problems = audit_arm_rows("join_semi_anti", ["kind", "n"], rows)
    assert len(problems) == 1
    assert "undeclared arms" in problems[0]
    assert "None" in problems[0] and "7" in problems[0]
