"""Structured Streaming surface (SURVEY.md §2.9 ST1-ST9)."""
