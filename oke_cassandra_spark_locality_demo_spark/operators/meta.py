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

from ..catalog import TABLES, load, register_views
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


@register(
    "q_quality_audit",
    oracle="""
    SELECT 'lineitem_null_keys' AS check_name,
           COUNT(*) FILTER (WHERE l_orderkey IS NULL OR l_partkey IS NULL) AS n_violations,
           COUNT(*) AS n_checked
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_orphan_orders',
           COUNT(*) FILTER (WHERE o.o_orderkey IS NULL),
           COUNT(*)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'lineitem_nonpositive_price',
           COUNT(*) FILTER (WHERE l_extendedprice <= 0),
           COUNT(*)
    FROM lineitem
    UNION ALL
    SELECT 'events_duplicate_ids',
           CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT),
           COUNT(*)
    FROM events
    UNION ALL
    SELECT 'orders_date_bounds',
           COUNT(*) FILTER (WHERE o_orderdate < TIMESTAMP '1992-01-01'
                               OR o_orderdate > TIMESTAMP '1998-12-31'),
           COUNT(*)
    FROM orders
    """,
)
def q_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite as one DataFrame: null keys,
    referential orphans (left-anti pattern via conditional count over a
    left join), value-domain and date-bound violations, duplicate event
    ids — the audit table a production pipeline gates every load on.
    Each check is a conditional aggregate, so the whole suite costs one
    pass per table plus one keyed join; checks over the same table could
    fuse further, but keeping one row per check keeps the gate readable.
    At 100 TB the orphan check is the expensive one — it reuses the same
    keyed-join strategy as every fact join (broadcast/bucket when
    available)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    e = load(spark, sf_dir, "events")

    def check(name: str, df: DataFrame, cond) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count_if(cond).alias("n_violations"),
            F.count(F.lit(1)).alias("n_checked"),
        )

    orphan = li.join(o, li.l_orderkey == o.o_orderkey, "left")
    dup_ids = e.agg(
        F.lit("events_duplicate_ids").alias("check_name"),
        (F.count(F.lit(1)) - F.countDistinct("event_id")).alias("n_violations"),
        F.count(F.lit(1)).alias("n_checked"),
    )
    lo = F.lit("1992-01-01").cast("timestamp")
    hi = F.lit("1998-12-31").cast("timestamp")
    return (
        check(
            "lineitem_null_keys",
            li,
            F.col("l_orderkey").isNull() | F.col("l_partkey").isNull(),
        )
        .unionByName(check("lineitem_orphan_orders", orphan, F.col("o_orderkey").isNull()))
        .unionByName(check("lineitem_nonpositive_price", li, F.col("l_extendedprice") <= 0))
        .unionByName(dup_ids)
        .unionByName(
            check(
                "orders_date_bounds",
                o,
                (F.col("o_orderdate") < lo) | (F.col("o_orderdate") > hi),
            )
        )
    )
