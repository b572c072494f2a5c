"""Sources & sinks (SURVEY.md §2.1): table-format abstraction and
synthetic generators."""
