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