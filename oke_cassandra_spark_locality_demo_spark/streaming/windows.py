"""Event-time windowed aggregations: tumbling / sliding / session.

Each key's registered form is the batch-equivalent expression (DuckDB-
oracle-checkable); `streaming_transform(key)` returns the identical
transformation for a streaming DataFrame, run by the tests through
`runtime.run_streaming_query` — Spark executes the same logical plan
incrementally, so batch and streaming results agree.

Scale: windowed aggs shuffle on (window, key); state size is bounded by
open windows × keys, and watermarks (stateful.py) bound "open".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import EVENTS_US, register


def _tumbling(e: DataFrame) -> DataFrame:
    w = F.window("ts", "10 minutes")
    return (
        e.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # tt-units, not SUM(decimal-cast): the double→decimal cast path
            # on full-noise events.value hash-failed q_agg_incremental on
            # the driver three rounds running (FIXTURES.md parity rules)
            F.sum(F.round(F.col("value") * 10000.0, 0).cast("long")).alias(
                "total_value_tt"
            ),
        )
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "event_type",
            "n",
            "total_value_tt",
        )
    )


@register(
    "q_stream_tumbling",
    oracle=f"""
    SELECT TIME_BUCKET(INTERVAL '10 minutes', ts) AS wstart,
           TIME_BUCKET(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS wend,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 10000.0) AS BIGINT)) AS BIGINT) AS total_value_tt
    FROM {EVENTS_US}
    GROUP BY 1, 2, 3
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute windows per event_type (batch form; both Spark
    `window()` and DuckDB `time_bucket` align buckets to epoch-divisible
    origins, so boundaries agree exactly)."""
    return _tumbling(load(spark, sf_dir, "events"))


def _sliding(e: DataFrame) -> DataFrame:
    w = F.window("ts", "10 minutes", "5 minutes")
    return (
        e.groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # tt-units, not SUM(decimal-cast): the double→decimal cast path
            # on full-noise events.value hash-failed q_agg_incremental on
            # the driver three rounds running (FIXTURES.md parity rules)
            F.sum(F.round(F.col("value") * 10000.0, 0).cast("long")).alias(
                "total_value_tt"
            ),
        )
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "n",
            "total_value_tt",
        )
    )


@register(
    "q_stream_sliding",
    oracle=f"""
    WITH expanded AS (
        SELECT TIME_BUCKET(INTERVAL '5 minutes', ts)
                   - k.k * INTERVAL '5 minutes' AS wstart,
               value
        FROM {EVENTS_US}, (SELECT UNNEST([0, 1]) AS k) k
    )
    SELECT wstart, wstart + INTERVAL '10 minutes' AS wend,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 10000.0) AS BIGINT)) AS BIGINT) AS total_value_tt
    FROM expanded
    GROUP BY 1, 2
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min length, 5 min slide): every event belongs
    to exactly two windows; the oracle reproduces Spark's expansion with
    an UNNEST over the two candidate offsets."""
    return _sliding(load(spark, sf_dir, "events"))


def _session(e: DataFrame) -> DataFrame:
    w = F.session_window("ts", "5 minutes")
    return (
        e.groupBy(w.alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 10000.0, 0).cast("long")).alias(
                "session_value_tt"
            ),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value_tt",
        )
    )


@register(
    "q_stream_session",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '5 minutes'
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM {EVENTS_US}
    ), numbered AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '5 minutes' AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 10000.0) AS BIGINT)) AS BIGINT) AS session_value_tt
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (5-minute gap) per user. Spark's
    `session_window` is boundary-INCLUSIVE: an event at exactly
    last_ts+gap still extends the session (verified by the hypothesis
    property test), so the gaps-and-islands oracle splits only when the
    gap is STRICTLY exceeded; end = last_ts + gap."""
    return _session(load(spark, sf_dir, "events"))


#: streaming-form lookup used by tests: same transforms over readStream.
STREAMING_FORMS = {
    "q_stream_tumbling": _tumbling,
    "q_stream_sliding": _sliding,
    "q_stream_session": _session,
}


def _multires(e: DataFrame) -> DataFrame:
    """10-minute tumbling windows rolled up to hours by windowing on the
    inner window's time column — `window(window_time(w), '1 hour')` is
    the chained-window API that keeps BOTH resolutions incremental in
    one streaming query (the inner aggregate shrinks state before the
    outer one; counts/sums merge because they are algebraic)."""
    fine = (
        e.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 10000.0, 0).cast("long")).alias("v_tt"),
        )
    )
    return (
        fine.groupBy(F.window(F.window_time("w"), "1 hour").alias("h"))
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("v_tt").alias("total_value_tt"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
        .select(
            F.col("h.start").alias("hstart"),
            "n_events",
            "total_value_tt",
            "n_buckets",
        )
    )


@register(
    "q_stream_multires",
    oracle=f"""
    WITH fine AS (
        SELECT TIME_BUCKET(INTERVAL '10 minutes', ts) AS wstart,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 10000.0) AS BIGINT)) AS BIGINT) AS v_tt
        FROM {EVENTS_US}
        GROUP BY 1
    )
    SELECT TIME_BUCKET(INTERVAL '1 hour', wstart) AS hstart,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(v_tt) AS BIGINT) AS total_value_tt,
           COUNT(*) AS n_buckets
    FROM fine GROUP BY 1
    """,
)
def q_stream_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup via chained time windows: minute-grain
    tumbling aggregates re-window into hours inside ONE query — the
    continuous-aggregate cascade TSDBs build materialized hierarchies
    for. Streamed, the inner window's partial state collapses volume
    before the outer window sees it; batch and oracle compute the same
    two-level TIME_BUCKET rollup. Integer ten-thousandth-unit sums keep
    the two-level merge bit-equal to a direct hourly aggregation.
    """
    return _multires(load(spark, sf_dir, "events"))
