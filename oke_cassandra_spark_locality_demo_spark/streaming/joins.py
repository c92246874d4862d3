"""Stream-stream interval join (SURVEY §2.3 streaming block extension).

The reference's declared stack (Spark; SURVEY §2.2) includes Structured
Streaming's stream-stream joins. The canonical shape: two event streams
joined on an equi key plus an event-time interval — here "non-purchase
events in the 10 minutes leading up to a purchase by the same user".

Batch form (registered, DuckDB-oracle-checked) and streaming form (run
by the tests as a real two-sided incremental join) share the same
transformation; Spark executes the identical logical join either way.

Scale: stream-stream joins keep both sides' unmatched rows in state
until the watermark plus the join interval passes them — the watermark
(30 min) and the 10-min interval bound state to ~40 min of events per
side, independent of total stream length. The equi key (user_id) makes
the state store hash-partitioned, so state lookups never cross tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import EVENTS_US, register


def _sides(e: DataFrame) -> tuple[DataFrame, DataFrame]:
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") != "purchase").select(
        F.col("event_id").alias("event_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
        "event_type",
    )
    return p, c


def _join(p: DataFrame, c: DataFrame) -> DataFrame:
    cond = (
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("e_ts") < F.col("p_ts"))
    )
    return p.join(c, cond).select(
        "purchase_id", "event_id", "event_type"
    )


@register(
    "q_stream_join_interval",
    oracle=f"""
    WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
               FROM {EVENTS_US} ev WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, ts AS e_ts, event_type
               FROM {EVENTS_US} ev WHERE event_type <> 'purchase')
    SELECT p.purchase_id, c.event_id, c.event_type
    FROM p JOIN c
      ON p.user_id = c.user_id
     AND c.e_ts >= p.p_ts - INTERVAL 10 MINUTE
     AND c.e_ts < p.p_ts
    """,
)
def q_stream_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events in the 10 minutes before each purchase by the same user —
    batch form of the stream-stream interval join (equi key + time
    bound; same plan shape Structured Streaming runs incrementally)."""
    p, c = _sides(load(spark, sf_dir, "events"))
    return _join(p, c)


def _enrich(e: DataFrame, customer: DataFrame) -> DataFrame:
    dim = customer.select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_mktsegment"
    )
    return e.join(F.broadcast(dim), "user_id").select(
        "event_id", "user_id", "event_type", "value", "c_name", "c_mktsegment"
    )


@register(
    "q_stream_join_static",
    oracle=f"""
    SELECT e.event_id, e.user_id, e.event_type, e.value, c.c_name, c.c_mktsegment
    FROM {EVENTS_US} e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def q_stream_join_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment: each event picks up its
    customer's name/segment. Batch form of the stateless stream-static
    join — the dim side is broadcast, so the streaming micro-batches
    (and, at scale, every executor) hash-probe a local copy and the
    event stream never shuffles. The static side is re-read per
    micro-batch, which is exactly how slowly-changing dims stay fresh."""
    e = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer")
    return _enrich(e, c)


def streaming_static_join(e: DataFrame, customer: DataFrame) -> DataFrame:
    """Streaming form: stateless inner join against a batch DataFrame —
    no watermark required; Spark plans it as a broadcast join inside
    every micro-batch."""
    return _enrich(e, customer)


def streaming_join(e: DataFrame) -> DataFrame:
    """Streaming form: both sides watermarked so Spark can expire join
    state once event time passes watermark + interval. The staged file
    source reads ts as TIMESTAMP_NTZ, which watermarks reject — cast to
    TIMESTAMP first (session TZ is UTC, so values are unchanged)."""
    p, c = _sides(e.withColumn("ts", F.col("ts").cast("timestamp")))
    return _join(
        p.withWatermark("p_ts", "30 minutes"),
        c.withWatermark("e_ts", "30 minutes"),
    )


def _outer_join(p: DataFrame, c: DataFrame) -> DataFrame:
    cond = (
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("e_ts") < F.col("p_ts"))
    )
    return p.join(c, cond, "left_outer").select(
        "purchase_id", "p_ts", "event_id", "event_type"
    )


@register(
    "q_stream_join_outer",
    oracle=f"""
    WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
               FROM {EVENTS_US} ev WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, ts AS e_ts, event_type
               FROM {EVENTS_US} ev WHERE event_type <> 'purchase'),
         cutoff AS (SELECT LEAST(
                        (SELECT MAX(ts) FROM {EVENTS_US} ev
                          WHERE event_type = 'purchase'),
                        (SELECT MAX(ts) FROM {EVENTS_US} ev
                          WHERE event_type <> 'purchase'))
                    - INTERVAL 35 MINUTE AS cut)
    SELECT p.purchase_id, p.p_ts, c.event_id, c.event_type
    FROM p LEFT JOIN c
      ON p.user_id = c.user_id
     AND c.e_ts >= p.p_ts - INTERVAL 10 MINUTE
     AND c.e_ts < p.p_ts
    WHERE p.p_ts <= (SELECT cut FROM cutoff)
    """,
)
def q_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every purchase emits,
    null-padded when no event preceded it within 10 minutes — the
    semantics that make outer streaming joins hard, because a
    null-match can only be declared once the watermark proves no
    matching row can still arrive. Output is restricted to the region
    the streaming form has provably finalized: the global watermark is
    the MIN over both sides' watermark nodes, and each side only sees
    its own filtered rows — so the finalized boundary is
    least(max purchase ts, max non-purchase ts) − 30m delay, minus 5m
    slack. (The r2 cutoff used max(all ts) − 45m; at sf0.01 the last
    purchase trails the last event by 32m, so that cutoff overshot the
    watermark and the batch side kept one null-padded row the stream
    had not yet finalized.) The same cutoff helper drives the
    streaming-equality test — an unbounded stream finalizes everything
    eventually; a finite replay leaves the tail pending by design.
    """
    p, c = _sides(load(spark, sf_dir, "events"))
    return (
        _outer_join(p, c)
        .crossJoin(F.broadcast(finalized_cutoff(load(spark, sf_dir, "events"))))
        .filter(F.col("p_ts") <= F.col("cut"))
        .drop("cut")
    )


def finalized_cutoff(events: DataFrame) -> DataFrame:
    """One-row DataFrame with the provably-finalized cutoff for the
    left-outer stream-stream join: global watermark = min over both
    sides' per-node watermarks (each node sees only its filtered rows),
    minus 5 minutes slack for boundary strictness."""
    return events.agg(
        (
            F.least(
                F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
                F.max(F.when(F.col("event_type") != "purchase", F.col("ts"))),
            )
            - F.expr("INTERVAL 35 MINUTES")
        ).alias("cut")
    )


def streaming_outer_join(e: DataFrame) -> DataFrame:
    """Streaming form of the left-outer interval join (both sides
    watermarked; null-padded results emit as the watermark passes)."""
    p, c = _sides(e.withColumn("ts", F.col("ts").cast("timestamp")))
    return _outer_join(
        p.withWatermark("p_ts", "30 minutes"),
        c.withWatermark("e_ts", "30 minutes"),
    )


@register(
    "q_stream_join_semi",
    oracle=f"""
    WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
               FROM {EVENTS_US} ev WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts AS e_ts
               FROM {EVENTS_US} ev WHERE event_type <> 'purchase')
    SELECT p.purchase_id, p.user_id, p.p_ts
    FROM p WHERE EXISTS (
        SELECT 1 FROM c
        WHERE c.user_id = p.user_id
          AND c.e_ts >= p.p_ts - INTERVAL 10 MINUTE
          AND c.e_ts < p.p_ts)
    """,
)
def q_stream_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI stream-stream interval join: purchases preceded by at
    least one same-user event in the prior 10 minutes — existence
    filtering without fan-out (each purchase emits at most ONCE no
    matter how many events matched; the inner form fans out per match).
    This is the streaming analog of engagement-qualified conversion.

    Unlike the outer join, semi needs no finalized-region cutoff in the
    equality test: a row emits as soon as its FIRST match arrives, so a
    full finite replay emits exactly the batch semi-join (only the
    never-matched rows — which semi never emits — depend on the
    watermark; the watermark's job here is purely state expiry).
    Scale: state is bounded to watermark+interval per side, and emitted
    purchases drop from state immediately on first match, so hot users
    with many matching events cost one probe each, not N² rows."""
    p, c = _sides(load(spark, sf_dir, "events"))
    return _semi_join(p, c)


def _semi_join(p: DataFrame, c: DataFrame) -> DataFrame:
    cond = (
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("e_ts") < F.col("p_ts"))
    )
    return p.join(c, cond, "left_semi").select(
        "purchase_id", F.col("p_user").alias("user_id"), "p_ts"
    )


def streaming_semi_join(e: DataFrame) -> DataFrame:
    """Streaming form of the left-semi interval join (both sides
    watermarked for state expiry; matches emit on first match)."""
    p, c = _sides(e.withColumn("ts", F.col("ts").cast("timestamp")))
    return _semi_join(
        p.withWatermark("p_ts", "30 minutes"),
        c.withWatermark("e_ts", "30 minutes"),
    )
