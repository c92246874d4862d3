"""Sorts, limits, top-k (SURVEY §2.3 "Sorts / limits / top-k").

Spark's global sort samples ranges first (RangePartitioner) and sorts
partitions in parallel; `orderBy(...).limit(k)` never materializes the
full sort — it compiles to TakeOrderedAndProject (per-partition heap of
k, merged at the driver), the only sane global top-k at 100 TB.
`limit(n)` alone is CollectLimit: it short-circuits the scan (the A8
`df.show()` analog — reference userdata/cloudinit.sh:351).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "q_sort_multi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal, o_orderkey
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 400000
    ORDER BY c_mktsegment ASC, c_acctbal DESC, o_orderkey ASC NULLS FIRST,
             c_custkey ASC
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort with mixed directions and explicit null
    ordering (Spark default is nulls-first-asc, DuckDB nulls-last — made
    explicit on both sides per FIXTURES.md)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    j = c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 400000), "left"
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal", "o_orderkey")
    return j.orderBy(
        F.col("c_mktsegment").asc(),
        F.col("c_acctbal").desc(),
        F.col("o_orderkey").asc_nulls_first(),
        F.col("c_custkey").asc(),
    )


@register(
    "q_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_orderkey
    LIMIT 20
    """,
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic LIMIT (ordered by the unique key first)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy("o_orderkey")
        .limit(20)
    )


@register(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 15
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (no full sort). Unique
    tiebreaker (o_orderkey) makes the boundary deterministic."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(15)
    )
