"""Structured Streaming: the reference's unbounded pipeline, stream-native."""
