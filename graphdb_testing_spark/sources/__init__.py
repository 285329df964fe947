"""Sources & sinks: the reference's binary formats, generators, and
stream sources re-expressed for Spark (SURVEY.md §2.1)."""
