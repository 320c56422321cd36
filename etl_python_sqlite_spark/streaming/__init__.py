"""Structured Streaming mirrors of the batch pipeline."""
