"""Structured Streaming: incremental triple extraction."""
