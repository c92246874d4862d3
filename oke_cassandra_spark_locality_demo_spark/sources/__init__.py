"""Sources & sinks beyond parquet scans (SURVEY §2.3 "Scans / sources / sinks")."""
