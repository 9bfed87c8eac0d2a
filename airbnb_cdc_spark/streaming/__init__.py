"""Structured Streaming: the change-feed CDC ingestion path."""
