"""Engine operators (SURVEY.md §2B). Each module documents the
reference behavior it generalizes with file:line citations."""
