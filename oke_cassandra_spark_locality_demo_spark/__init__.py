"""spark-graft: a PySpark-native analytics engine.

Re-expresses the capability surface of the reference repo
(`adinan-tech/oke-cassandra-spark-locality-demo`, an OKE/Terraform demo whose data
plane is a Cassandra table read by Spark through the DataStax connector —
see /root/reference/userdata/cloudinit.sh:296-352) as an idiomatic
PySpark engine over Parquet, plus the LLM-data-pipeline operator tail
(dedup, similarity search, multimodal columns, text analysis) mandated
by BASELINE.json.

Layout:
    session.py    — SparkSession factory (AQE, UTC, shuffle sizing)
    catalog.py    — fixture tables as temp views + the `users` mirror
    registry.py   — query registry binding each operator to its DuckDB oracle
    conf.py       — 100 TB partitioning/scale policy
    operators/    — relational operators (scans, filters, joins, aggs, windows, …)
    functions/    — scalar function families (string/date/math/array/map/json)
    sources/      — non-parquet ingest (CSV/JSON) + sinks
    streaming/    — Structured Streaming forms over `events`
    llm/          — dedup, similarity search, text analysis, multimodal
    plans/        — plan-shape inspection helpers (pushdown/exchange assertions)
"""

__version__ = "0.1.0"
