"""Streaming / stateful semantics (SURVEY.md §2.11)."""
