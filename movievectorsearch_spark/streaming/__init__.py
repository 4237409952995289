"""Structured Streaming analogs of the reference's incremental
ingestion loop (SURVEY.md §2.10)."""
