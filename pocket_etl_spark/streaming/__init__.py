"""Structured Streaming layer: the CDC binlog/WAL tail."""
