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


def _spread16(c: "F.Column") -> "F.Column":
    """Interleave-ready bit spread: 16-bit value → even bit positions of a
    32-bit word (the standard magic-mask doubling sequence)."""
    c = c.bitwiseAND(F.lit(0xFFFF))
    c = (c.bitwiseOR(F.shiftleft(c, 8))).bitwiseAND(F.lit(0x00FF00FF))
    c = (c.bitwiseOR(F.shiftleft(c, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    c = (c.bitwiseOR(F.shiftleft(c, 2))).bitwiseAND(F.lit(0x33333333))
    c = (c.bitwiseOR(F.shiftleft(c, 1))).bitwiseAND(F.lit(0x55555555))
    return c


#: rows per simulated file in the z-order clustering audit
_Z_BUCKET = 4096


@register(
    "q_sort_zorder",
    oracle=f"""
    WITH z AS (
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
               (
                 (((((l_partkey & 65535) | ((l_partkey & 65535) << 8)) & 16711935
                    | ((((l_partkey & 65535) | ((l_partkey & 65535) << 8)) & 16711935) << 4)) & 252645135
                    | (((((l_partkey & 65535) | ((l_partkey & 65535) << 8)) & 16711935
                        | ((((l_partkey & 65535) | ((l_partkey & 65535) << 8)) & 16711935) << 4)) & 252645135) << 2)) & 858993459
                    | ((((((l_partkey & 65535) | ((l_partkey & 65535) << 8)) & 16711935
                        | ((((l_partkey & 65535) | ((l_partkey & 65535) << 8)) & 16711935) << 4)) & 252645135
                        | (((((l_partkey & 65535) | ((l_partkey & 65535) << 8)) & 16711935
                            | ((((l_partkey & 65535) | ((l_partkey & 65535) << 8)) & 16711935) << 4)) & 252645135) << 2)) & 858993459) << 1)) & 1431655765
               )
               |
               ((
                 (((((l_suppkey & 65535) | ((l_suppkey & 65535) << 8)) & 16711935
                    | ((((l_suppkey & 65535) | ((l_suppkey & 65535) << 8)) & 16711935) << 4)) & 252645135
                    | (((((l_suppkey & 65535) | ((l_suppkey & 65535) << 8)) & 16711935
                        | ((((l_suppkey & 65535) | ((l_suppkey & 65535) << 8)) & 16711935) << 4)) & 252645135) << 2)) & 858993459
                    | ((((((l_suppkey & 65535) | ((l_suppkey & 65535) << 8)) & 16711935
                        | ((((l_suppkey & 65535) | ((l_suppkey & 65535) << 8)) & 16711935) << 4)) & 252645135
                        | (((((l_suppkey & 65535) | ((l_suppkey & 65535) << 8)) & 16711935
                            | ((((l_suppkey & 65535) | ((l_suppkey & 65535) << 8)) & 16711935) << 4)) & 252645135) << 2)) & 858993459) << 1)) & 1431655765
               ) << 1) AS zval
        FROM lineitem
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY zval, l_orderkey, l_linenumber) AS rn
        FROM z
    )
    SELECT (rn - 1) // {_Z_BUCKET} AS file_id,
           COUNT(*) AS n,
           MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
           MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp
    FROM ranked
    GROUP BY 1
    """,
)
def q_sort_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering on (l_partkey, l_suppkey): bits
    of both keys interleave into one sort key, the table is range-sorted
    by it, and the result reports per-simulated-file min/max ranges of
    BOTH dimensions — the audit that shows why z-ordering enables data
    skipping on either column (each file covers a narrow rectangle, so a
    predicate on partkey OR suppkey prunes most files from min/max
    stats). Pure bit arithmetic in codegen; at 100 TB this is the
    OPTIMIZE ZORDER layout pass run before writing, and the min/max
    audit is what the parquet footers will contain.

    The global rank uses the bucket+offset decomposition (same shape as
    q_ordinal_assign / TeraSort), NOT `row_number() OVER (ORDER BY
    zval)` — an unpartitioned window funnels the whole table through
    one task. Rows map order-preservingly to zval-range buckets
    (bounds from a broadcast max), the tiny per-bucket counts
    prefix-sum into offsets, and each bucket ranks its own rows in
    parallel: rank = offset + local row_number."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    z = _spread16(F.col("l_partkey")).bitwiseOR(
        F.shiftleft(_spread16(F.col("l_suppkey")), 1)
    )
    from pyspark.sql import Window as W

    zt = li.withColumn("zval", z)
    mx = zt.agg(F.max("zval").alias("mx"))
    b = zt.crossJoin(F.broadcast(mx)).withColumn(
        "bucket", F.floor(F.col("zval") * 32 / (F.col("mx") + 1))
    )
    counts = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("nb"))
    offsets = counts.withColumn(
        "offset",
        F.coalesce(
            F.sum("nb").over(
                W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("bucket", "offset")
    local_rn = F.row_number().over(
        W.partitionBy("bucket").orderBy("zval", "l_orderkey", "l_linenumber")
    )
    return (
        b.join(F.broadcast(offsets), "bucket")
        .withColumn("rn", F.col("offset") + local_rn)
        .groupBy(((F.col("rn") - 1) / _Z_BUCKET).cast("long").alias("file_id"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_partkey").alias("min_part"),
            F.max("l_partkey").alias("max_part"),
            F.min("l_suppkey").alias("min_supp"),
            F.max("l_suppkey").alias("max_supp"),
        )
    )
