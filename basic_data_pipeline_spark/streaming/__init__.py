"""Structured Streaming layer: CDC ingestion + event-time windows."""
