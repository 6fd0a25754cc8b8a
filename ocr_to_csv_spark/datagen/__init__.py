"""Deterministic synthetic corpus generator (FIXTURES.md)."""
