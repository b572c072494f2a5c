"""Operator library (SURVEY.md §2.3–§2.6): fluent-bit's filter/router/
aggregation semantics re-expressed as Column combinators and DataFrame
transforms — one Catalyst plan, not a chain of msgpack rewrites."""
