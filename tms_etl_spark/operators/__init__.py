"""Engine operators (SURVEY.md §2) — thin, idiomatic Spark compositions."""
