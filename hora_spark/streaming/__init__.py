"""Incremental ingestion: append → delta segment build → merge-on-read,
plus a Structured Streaming ingest wrapper."""
