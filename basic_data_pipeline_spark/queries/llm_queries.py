"""LLM-data-pipeline operators (SURVEY.md §2.11): dedup, similarity,
text analysis, multimodal plumbing. Populated in Phase 3."""
