"""Join and set-operation queries (SURVEY.md §2.3, §2.7) — filled in
milestone 1."""
