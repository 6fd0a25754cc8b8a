"""Structured Streaming lift of the batch pipeline (SURVEY.md §2.9)."""
