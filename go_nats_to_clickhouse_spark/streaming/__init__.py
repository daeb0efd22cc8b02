"""Structured Streaming layer: the micro-batch ingestion pipeline."""
