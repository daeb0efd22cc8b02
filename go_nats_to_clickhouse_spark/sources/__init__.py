"""Streaming sources: the NATS JetStream DataSource (Spark 4 Python Data
Source API) and file-backed dev stand-ins with the identical schema."""
