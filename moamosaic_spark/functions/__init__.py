"""Scalar/relational function library: portable hashing, text analysis,
deduplication, similarity search."""
