"""CDC/ingestion operators exposed as batch queries (SURVEY.md §2.1, §2.9).

Populated in Phase 2: envelope decode, normalize, upsert-compaction,
delete-apply, schema evolution — each expressed over the fixture tables so
the DuckDB oracle can verify the same semantics.
"""
