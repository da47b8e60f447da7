"""Structured Streaming ingest (reference has no streaming; this is the
incremental-crawl path a web-scale deployment needs)."""
