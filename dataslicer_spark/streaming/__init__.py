"""Event-time window aggregations — batch and Structured Streaming."""
