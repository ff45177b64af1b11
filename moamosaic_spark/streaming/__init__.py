"""Resumable/incremental execution: lineage checkpointing and the
Structured-Streaming wrapper for incremental tile feeds."""
