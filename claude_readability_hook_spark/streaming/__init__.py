"""Structured Streaming wrapper reusing the batch pipeline."""
