"""Engine/system metadata queries — the A5 analog.

Reference: the demo's readiness probe reads `system.local`
(`SELECT release_version FROM system.local`,
/root/reference/userdata/cloudinit.sh:285-286). The Spark-native
equivalent is a one-row engine-info DataFrame plus the session catalog
listing — same purpose: a cheap liveness/metadata query with no table
scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


@register(
    "q_profile_columns",
    oracle="""
    WITH a AS (
        SELECT COUNT(*) AS n,
               COUNT(o_orderkey) AS k1_nn, COUNT(DISTINCT o_orderkey) AS k1_nd,
               MIN(CAST(o_orderkey AS DOUBLE)) AS k1_min, MAX(CAST(o_orderkey AS DOUBLE)) AS k1_max,
               COUNT(o_custkey) AS k2_nn, COUNT(DISTINCT o_custkey) AS k2_nd,
               MIN(CAST(o_custkey AS DOUBLE)) AS k2_min, MAX(CAST(o_custkey AS DOUBLE)) AS k2_max,
               COUNT(o_totalprice) AS k3_nn, COUNT(DISTINCT o_totalprice) AS k3_nd,
               MIN(CAST(o_totalprice AS DOUBLE)) AS k3_min, MAX(CAST(o_totalprice AS DOUBLE)) AS k3_max,
               COUNT(o_orderstatus) AS s1_nn, COUNT(DISTINCT o_orderstatus) AS s1_nd,
               MIN(o_orderstatus) AS s1_min, MAX(o_orderstatus) AS s1_max,
               COUNT(o_orderpriority) AS s2_nn, COUNT(DISTINCT o_orderpriority) AS s2_nd,
               MIN(o_orderpriority) AS s2_min, MAX(o_orderpriority) AS s2_max
        FROM orders
    )
    SELECT 'o_orderkey' AS column_name, n AS n_rows, n - k1_nn AS n_null,
           k1_nd AS n_distinct, k1_min AS min_num, k1_max AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM a
    UNION ALL
    SELECT 'o_custkey', n, n - k2_nn, k2_nd, k2_min, k2_max, NULL, NULL FROM a
    UNION ALL
    SELECT 'o_totalprice', n, n - k3_nn, k3_nd, k3_min, k3_max, NULL, NULL FROM a
    UNION ALL
    SELECT 'o_orderstatus', n, n - s1_nn, s1_nd, NULL, NULL, s1_min, s1_max FROM a
    UNION ALL
    SELECT 'o_orderpriority', n, n - s2_nn, s2_nd, NULL, NULL, s2_min, s2_max FROM a
    """,
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler (DESCRIBE/ANALYZE analog): one
    aggregate computes count / nulls / exact distinct / min / max for
    every profiled column, then the flat stat row is fanned out to one
    long-format row per column. One table scan regardless of column
    count — the property that makes profiling affordable at 100 TB
    (the naive per-column loop is C scans). The long format comes from
    `stack` over the single aggregate row, NOT a C-way union of selects:
    union branches are column-pruned into *different* aggregates and
    re-scan the table per branch (measured: 5 scans), while the
    generator provably keeps one scan (asserted in tests/test_plans.py).
    Numeric and string columns carry their extrema in typed
    min_num/min_str slots rather than a lossy string cast (engine float
    formatting differs)."""
    o = load(spark, sf_dir, "orders")
    num_cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    str_cols = ["o_orderstatus", "o_orderpriority"]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in num_cols + str_cols:
        aggs.append(F.count(c).alias(f"{c}_nn"))
        aggs.append(F.countDistinct(c).alias(f"{c}_nd"))
    for c in num_cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"{c}_min"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"{c}_max"))
    for c in str_cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    a = o.agg(*aggs)

    null_s, null_d = F.lit(None).cast("string"), F.lit(None).cast("double")
    stack_args: list = [F.lit(len(num_cols) + len(str_cols))]
    for c in num_cols:
        stack_args += [
            F.lit(c), F.col("_n") - F.col(f"{c}_nn"), F.col(f"{c}_nd"),
            F.col(f"{c}_min"), F.col(f"{c}_max"), null_s, null_s,
        ]
    for c in str_cols:
        stack_args += [
            F.lit(c), F.col("_n") - F.col(f"{c}_nn"), F.col(f"{c}_nd"),
            null_d, null_d, F.col(f"{c}_min"), F.col(f"{c}_max"),
        ]
    stacked = F.stack(*stack_args).alias(
        "column_name", "n_null", "n_distinct", "min_num", "max_num",
        "min_str", "max_str",
    )
    return a.select(F.col("_n").alias("n_rows"), stacked).select(
        "column_name", "n_rows", "n_null", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    )


@register(
    "q_profile_skew",
    oracle="""
    WITH f AS (
        SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders GROUP BY 1
    ),
    t AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_keys
        FROM f
    ),
    top AS (
        SELECT k, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, k) AS rank
        FROM f QUALIFY rank <= 10
    )
    SELECT top.k AS custkey, top.cnt, CAST(top.rank AS BIGINT) AS rank,
           (top.cnt * 1000000) // t.n_rows AS share_ppm,
           (top.cnt * t.n_keys * 100) // t.n_rows AS hot_x100
    FROM top CROSS JOIN t
    ORDER BY rank
    """,
)
def q_profile_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-KEY SKEW profiler: the top-10 heaviest values of a join key
    (o_custkey) with each one's row share and its heat relative to a
    uniform key distribution (`hot_x100` = how many times more rows
    than an average key carries, x100) — the diagnostic that decides
    whether a join needs salting or AQE skew handling BEFORE running it
    at 100 TB, the same per-key frequency pass Spark's own skew-join
    planner does at runtime.

    One map-side-combinable groupBy builds the key histogram; the
    totals are a 1-row aggregate of it; top-10 is a TakeOrdered with a
    deterministic (count desc, key asc) tie-break, and the rank window
    runs over those 10 rows only — never over the histogram. Shares
    and heat are integer division (`div` / `//`), identical on both
    engines; all-integer emissions."""
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    f = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    t = f.agg(
        F.sum("cnt").alias("n_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    top = f.orderBy(F.col("cnt").desc(), "k").limit(10)
    # rank window over the already-reduced 10-row top list, not the histogram
    w = Window.orderBy(F.col("cnt").desc(), "k")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(t))
        .select(
            F.col("k").alias("custkey"),
            "cnt",
            F.col("rank").cast("long").alias("rank"),
            F.expr("(cnt * 1000000) div n_rows").alias("share_ppm"),
            F.expr("(cnt * n_keys * 100) div n_rows").alias("hot_x100"),
        )
        .orderBy("rank")
    )
