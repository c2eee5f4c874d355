"""Shared expression helpers (engine-internal function library)."""
