"""Structured Streaming: incremental near-duplicate detection."""
