"""DataFrame transform operators (SURVEY.md §2)."""
