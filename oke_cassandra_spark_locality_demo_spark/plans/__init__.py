"""Plan inspection helpers (SURVEY §5.2(c) plan-shape assertions)."""
