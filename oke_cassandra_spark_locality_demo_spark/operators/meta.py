"""Engine/system metadata queries — the A5 analog.

Reference: the demo's readiness probe reads `system.local`
(`SELECT release_version FROM system.local`,
/root/reference/userdata/cloudinit.sh:285-286). The Spark-native
equivalent is a one-row engine-info DataFrame plus the session catalog
listing — same purpose: a cheap liveness/metadata query with no table
scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import TABLES, register_views
from ..registry import register


def engine_info(spark: SparkSession) -> DataFrame:
    """One-row engine metadata (the `system.local` analog)."""
    return spark.createDataFrame(
        [(spark.version, spark.sparkContext.master, "spark-graft")],
        "release_version string, master string, engine string",
    )


@register(
    "q_meta_tables",
    oracle="""
    SELECT * FROM (VALUES
        ('customer'), ('documents'), ('embeddings'), ('events'), ('lineitem'),
        ('nation'), ('orders'), ('part'), ('region'), ('supplier'), ('users')
    ) AS t(table_name)
    """,
)
def q_meta_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog listing (the `system` keyspace analog): register the
    fixture views and read the table names back from the session
    catalog itself."""
    register_views(spark, sf_dir)
    listed = spark.sql("SHOW VIEWS").select(
        F.col("viewName").alias("table_name")
    )
    known = {*TABLES, "users"}
    return listed.filter(F.col("table_name").isin(*known))


@register("q_meta_engine_info")  # rows-only: version strings are env-specific
def q_meta_engine_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Liveness probe (A5): one row, no scan — `release_version` mirrors
    the reference's readiness check column name."""
    return engine_info(spark)
