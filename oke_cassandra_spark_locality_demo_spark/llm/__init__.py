"""LLM-data-pipeline operators (BASELINE.json mandate): deduplication,
similarity search, text analysis, multimodal columns."""
