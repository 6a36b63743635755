"""Window / time-series / streaming-shaped queries (SURVEY.md §2.5,
§2.9) — filled in milestone 2."""
