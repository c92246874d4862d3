"""Projection & predicate operators (SURVEY §2.3 "Projection / filters").

The reference executes only `SELECT *` (userdata/cloudinit.sh:346-351);
its declared connector pushes predicates/projections to CQL (README.md:135).
These queries exercise the full predicate surface Catalyst pushes to
parquet: comparisons, boolean algebra, IN/BETWEEN/LIKE, null semantics,
conditional projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "q_project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
           l_quantity * 2.0 + 1.0 AS qty_expr
    FROM lineitem
    """,
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projections with aliases; per-row IEEE arithmetic is
    bit-identical between Spark and DuckDB."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charged"),
        (F.col("l_quantity") * 2.0 + 1.0).alias("qty_expr"),
    )


@register(
    "q_filter_conj",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE (l_quantity > 40 AND l_discount < 0.05)
       OR (l_returnflag = 'R' AND NOT (l_tax > 0.03))
    """,
)
def q_filter_conj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND / OR / NOT with comparisons."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_quantity") > 40) & (F.col("l_discount") < 0.05))
        | ((F.col("l_returnflag") == "R") & ~(F.col("l_tax") > 0.03))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@register(
    "q_filter_in_between_like",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice, o_orderstatus
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 10000 AND 200000
      AND o_orderpriority LIKE '%URGENT%'
    """,
)
def q_filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / BETWEEN / LIKE predicates."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(10000, 200000)
        & F.col("o_orderpriority").like("%URGENT%")
    ).select("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderstatus")


@register(
    "q_filter_rlike",
    oracle=r"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE regexp_matches(text, 'scan .* merge')
      AND lang = 'en'
    """,
)
def q_filter_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate (rlike). Pattern kept to RE2-/Java-regex-common
    syntax so Spark (Java regex) and DuckDB (RE2) agree."""
    d = load(spark, sf_dir, "documents")
    return d.filter(
        F.col("text").rlike("scan .* merge") & (F.col("lang") == "en")
    ).select("doc_id", "lang", "source")


@register(
    "q_filter_null",
    oracle="""
    SELECT e.event_id, e.user_id,
           COALESCE(o.o_orderkey, -1) AS matched_order,
           (o.o_orderkey IS NULL) AS unmatched,
           (o.o_orderkey IS NOT DISTINCT FROM e.user_id) AS nullsafe_eq
    FROM events e
    LEFT JOIN orders o ON e.event_id = o.o_orderkey AND o.o_orderkey > 900
    """,
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL, null-safe equality, coalesce — nulls manufactured
    via a deliberately partial left join (fixtures are null-free)."""
    e = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")
    joined = e.join(
        o, (e.event_id == o.o_orderkey) & (o.o_orderkey > 900), "left"
    )
    return joined.select(
        "event_id",
        "user_id",
        F.coalesce(F.col("o_orderkey"), F.lit(-1)).alias("matched_order"),
        F.col("o_orderkey").isNull().alias("unmatched"),
        F.col("o_orderkey").eqNullSafe(F.col("user_id")).alias("nullsafe_eq"),
    )


@register(
    "q_case_when",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE
             WHEN l_quantity >= 45 THEN 'bulk'
             WHEN l_quantity >= 20 THEN 'mid'
             ELSE 'small'
           END AS qty_band,
           CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END AS returned_value
    FROM lineitem
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional projection (when/otherwise chains)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") >= 45, "bulk")
        .when(F.col("l_quantity") >= 20, "mid")
        .otherwise("small")
        .alias("qty_band"),
        F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice"))
        .otherwise(F.lit(0.0))
        .alias("returned_value"),
    )
