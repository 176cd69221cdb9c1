"""Structured Streaming wiring around the batch core."""
