"""Structured Streaming ingest and windowed aggregation."""
