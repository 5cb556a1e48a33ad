"""Utilities: timing, testing helpers, data generators."""
