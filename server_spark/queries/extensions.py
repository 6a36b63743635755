"""EXT queries: dedup, similarity search, text analysis, multimodal
(SURVEY.md §2 EXT rows) — filled in milestone 3."""
