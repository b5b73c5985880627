"""Structured Streaming extensions (SURVEY §2.6 Tier E)."""
