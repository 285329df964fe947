"""Streaming / workflow layer (SURVEY.md §2.8)."""
