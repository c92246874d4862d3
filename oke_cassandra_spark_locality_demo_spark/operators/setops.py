"""Set operations (SURVEY §2.3 "Set operations").

UNION ALL is a zero-shuffle concatenation of partition lists; UNION/
INTERSECT/EXCEPT add a hash-aggregate/join on the full row — at scale,
prefer pre-projecting to the minimal column set first (done here) so
the shuffle carries only what the set-compare needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


def _big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("custkey"))
    )


def _building_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )


@register(
    "q_union",
    oracle="""
    SELECT custkey, COUNT(*) AS n
    FROM (
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
        UNION ALL
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    GROUP BY custkey
    """,
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (positional concat via unionByName) + count to make the
    multiset visible to the hash check."""
    u = _big_spenders(spark, sf_dir).unionByName(_building_segment(spark, sf_dir))
    return u.groupBy("custkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_union_distinct",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    UNION
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with dedup (`distinct` = hash aggregate on the row)."""
    return (
        _big_spenders(spark, sf_dir)
        .unionByName(_building_segment(spark, sf_dir))
        .distinct()
    )


@register(
    "q_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    INTERSECT
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    return _big_spenders(spark, sf_dir).intersect(_building_segment(spark, sf_dir))


@register(
    "q_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): BUILDING customers who are not big
    spenders (`subtract` = EXCEPT DISTINCT)."""
    return _building_segment(spark, sf_dir).subtract(_big_spenders(spark, sf_dir))

@register(
    "q_snapshot_diff",
    oracle="""
    WITH v1 AS (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0
    ),
    v2 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0
                    THEN o_totalprice + 1000 ELSE o_totalprice END
                   AS o_totalprice
        FROM orders WHERE o_orderkey % 11 <> 0
    )
    SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
           CASE WHEN v1.o_orderkey IS NULL THEN 'added'
                WHEN v2.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change,
           v1.o_totalprice AS old_total,
           v2.o_totalprice AS new_total
    FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
       OR v1.o_totalprice <> v2.o_totalprice
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the dataset-versioning primitive: two table
    versions (derived deterministically from the fixture: v2 drops some
    keys, adds the keys v1 lacked, and reprices every 5th order) full-
    outer join on the primary key and classify each key as added /
    removed / changed, with old and new values side by side. This is
    how a 100 TB pipeline audits what an ingest actually did, and the
    derivation half of CDC (`q_cdc_apply` consumes such a feed).

    Scale shape: one key-partitioned full outer join; unchanged rows —
    the overwhelming majority — are filtered out by a codegen'd value
    comparison (at width, a row-hash comparison) immediately after the
    join, so only the delta survives to downstream. With both snapshots
    bucketed on the key (q_join_bucketed's layout) the diff is
    exchange-free.
    """
    o = load(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", F.col("o_totalprice").alias("old_total")
    )
    v2 = o.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey",
        # +1000, not *1.1-and-round: ROUND on a double diverges between
        # engines at half-cent boundaries (Spark rounds the shortest
        # decimal rendering, DuckDB the binary value); addition is one
        # identical IEEE op on both sides
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1000)
        .otherwise(F.col("o_totalprice"))
        .alias("new_total"),
    )
    j = v1.join(v2, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("old_total").isNull(), "added")
        .when(F.col("new_total").isNull(), "removed")
        .otherwise("changed")
    )
    return j.filter(
        F.col("old_total").isNull()
        | F.col("new_total").isNull()
        | (F.col("old_total") != F.col("new_total"))
    ).select("o_orderkey", change.alias("change"), "old_total", "new_total")


@register(
    "q_intersect_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
    ORDER BY custkey
    """,
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: a custkey appearing m times on
    the left and n times on the right survives min(m, n) times, which
    DISTINCT-based intersect silently collapses. Spark plans
    intersectAll as a counted hash aggregation per side + generate —
    one shuffle per side on the compare key, no row explosion beyond
    the multiplicity floor. Multiplicities matter here: customers
    place many orders, so both sides are genuine bags (reference
    analog: SURVEY §2.3 set-op row; the ALL variants complete it)."""
    orders = load(spark, sf_dir, "orders")
    left = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    right = orders.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("custkey")
    )
    return left.intersectAll(right).orderBy("custkey")


@register(
    "q_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
    ORDER BY custkey
    """,
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag semantics: each right-side occurrence cancels
    ONE left-side occurrence (m - n copies survive), the multiset
    difference DISTINCT-based except cannot express. Same counted-
    aggregation plan shape as q_intersect_all."""
    orders = load(spark, sf_dir, "orders")
    left = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    right = orders.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("custkey")
    )
    return left.exceptAll(right).orderBy("custkey")
