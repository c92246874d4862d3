"""Structured Streaming operators over `events` (SURVEY §2.3 "Streaming").

Every operator has two forms: a batch-equivalent expression (registered
in the query registry so the DuckDB oracle checks it) and a true
Structured Streaming form (exercised with `trigger(availableNow=True)`
by `runtime.run_streaming_query` and the test suite). Spark guarantees
the two agree for the deterministic operators — the streaming form is
the same logical plan executed incrementally with state.
"""
