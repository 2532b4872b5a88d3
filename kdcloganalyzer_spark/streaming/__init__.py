"""Structured Streaming operators (SURVEY.md §7 phase 6)."""
