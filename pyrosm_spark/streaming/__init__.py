"""Structured Streaming ingestion for the engine's tables."""
