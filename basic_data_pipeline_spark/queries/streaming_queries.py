"""Streaming-semantics operators surfaced as batch-checkable queries
(SURVEY.md §2.9): event-time windows, sessionization. Populated in
Phase 2."""
