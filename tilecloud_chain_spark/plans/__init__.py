"""Plan-level compositions (SURVEY.md §3): generate-tiles pipeline, cost
estimation, WMTS capabilities math."""
