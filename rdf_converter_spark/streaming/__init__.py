"""Structured Streaming: incremental triple extraction, watermarked
windows, stateful sessionization."""
