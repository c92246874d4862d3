"""Relational operator inventory (SURVEY §2.3)."""
