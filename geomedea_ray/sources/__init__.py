"""Deterministic synthetic sources + testdata-derived views."""
