"""Window functions (SURVEY §2.3 "Window functions").

Windows shuffle once on partitionBy keys and sort within partitions —
at 100 TB the key choice dominates: per-user/per-supplier partitions are
small and parallel; a window with no partitionBy is a single-task sort
and is avoided everywhere here.

Determinism: every orderBy includes a unique tiebreaker (event_id /
(l_orderkey, l_linenumber)) so row_number/lag/lead are reproducible —
identical requirement for the DuckDB oracle to hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import EVENTS_US, register


@register(
    "q_win_rank",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w2 AS rnk,
           DENSE_RANK() OVER w2 AS drnk,
           NTILE(4) OVER w AS quartile
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber),
           w2 AS (PARTITION BY l_suppkey ORDER BY l_quantity DESC)
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family: row_number / rank / dense_rank / ntile."""
    li = load(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    w2 = W.partitionBy("l_suppkey").orderBy(F.col("l_quantity").desc())
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w2).alias("rnk"),
        F.dense_rank().over(w2).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "q_win_analytic",
    oracle=f"""
    SELECT event_id, user_id, ts, value,
           LAG(value, 1) OVER w AS prev_value,
           LEAD(value, 1) OVER w AS next_value,
           FIRST_VALUE(value) OVER w AS first_value_in_user,
           LAG(ts, 1) OVER w AS prev_ts
    FROM {EVENTS_US}
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic family: lag / lead / first_value over a per-user timeline."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        F.first("value").over(w).alias("first_value_in_user"),
        F.lag("ts", 1).over(w).alias("prev_ts"),
    )


@register(
    "q_win_frame_rows",
    oracle=f"""
    SELECT event_id, user_id, ts, value,
           CAST(SUM(CAST(value AS DECIMAL(28,4)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_value,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running_n,
           CAST(SUM(CAST(value AS DECIMAL(28,4)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS moving3_sum
    FROM {EVENTS_US}
    """,
)
def q_win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frames: running total and 3-row moving sum. Sums run over
    decimal casts so the running values are exact (float running sums
    would drift between engines)."""
    e = load(spark, sf_dir, "events")
    dec_val = F.col("value").cast("decimal(28,4)")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    running = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    moving = w.rowsBetween(-2, W.currentRow)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.sum(dec_val).over(running).cast("double").alias("running_value"),
        F.count(F.lit(1)).over(running).alias("running_n"),
        F.sum(dec_val).over(moving).cast("double").alias("moving3_sum"),
    )


@register(
    "q_win_frame_range",
    oracle=f"""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(28,4)))
                OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS hour_value,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
               AS hour_n
    FROM {EVENTS_US}
    """,
)
def q_win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: per-user trailing 1-hour sum/count.
    The frame is an INTERVAL range on the timestamp itself (no epoch
    conversion — timezone-independent, and both engines see identical
    µs-truncated values)."""
    e = load(spark, sf_dir, "events")
    frame = (
        "PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW"
    )
    return e.selectExpr(
        "event_id",
        "user_id",
        "ts",
        f"CAST(SUM(CAST(value AS DECIMAL(28,4))) OVER ({frame}) AS DOUBLE) AS hour_value",
        f"COUNT(*) OVER ({frame}) AS hour_n",
    )


@register(
    "q_topk_per_group",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn
    FROM (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
               ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                  ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        FROM lineitem
    )
    WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 line items per supplier — window rank + filter. Spark pushes
    the rank limit into the sort (WindowGroupLimit) so each partition
    keeps only k rows pre-shuffle — the scalable per-group top-k."""
    li = load(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )
