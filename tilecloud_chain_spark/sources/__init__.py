"""Scan operators (SURVEY.md §2.1)."""
