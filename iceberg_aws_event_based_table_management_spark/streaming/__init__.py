"""Structured Streaming re-expression of the reference's event path."""
