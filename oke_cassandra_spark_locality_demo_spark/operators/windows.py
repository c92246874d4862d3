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
    "q_funnel_conversion",
    oracle=f"""
    WITH ev AS (SELECT * FROM {EVENTS_US}),
    signups AS (
        SELECT s.user_id, s.ts,
               EXISTS (
                   SELECT 1 FROM ev p
                   WHERE p.user_id = s.user_id AND p.event_type = 'purchase'
                     AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL '30 minutes'
               ) AS converted
        FROM ev s WHERE s.event_type = 'signup'
    )
    SELECT user_id,
           COUNT(*) AS n_signups,
           CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
    FROM signups
    GROUP BY user_id
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: signups converting to a purchase within 30
    minutes, per user. Scalable formulation: no self-join — interleave
    both event types and scan each user's timeline *backward*, carrying
    the earliest later purchase with a running `last(ignorenulls)`; a
    signup converts iff that carried purchase is within the window.
    One shuffle on user_id regardless of data size (the EXISTS-subquery
    oracle would be a quadratic correlated scan at scale)."""
    e = load(spark, sf_dir, "events")
    su = e.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.lit(1).alias("is_signup"),
        F.lit(None).cast("timestamp_ntz").alias("p_ts"),
    )
    pu = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(0).alias("is_signup"),
        F.col("ts").alias("p_ts"),
    )
    # scan backward: purchases at the same instant sort first so a
    # purchase at exactly the signup ts counts (>= semantics)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_signup").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = su.unionByName(pu).select(
        "*", F.last("p_ts", ignorenulls=True).over(w).alias("next_purchase")
    )
    conv = (
        carried.filter(F.col("is_signup") == 1)
        .select(
            "user_id",
            (
                F.col("next_purchase").isNotNull()
                & (F.col("next_purchase") <= F.col("ts") + F.expr("INTERVAL 30 MINUTES"))
            ).alias("converted"),
        )
    )
    return conv.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_signups"),
        F.sum(F.when(F.col("converted"), 1).otherwise(0)).cast("long").alias("n_converted"),
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


@register(
    "q_win_distribution",
    oracle="""
    SELECT c_custkey, c_nationkey,
           -- no ROUND: (rank-1)/(n-1) and rank/n are single IEEE
           -- divisions of identical ints, so the raw doubles are
           -- bit-identical across engines, while ROUND(x, 6) diverges
           -- when the true ratio lands exactly on a half (333/640 did)
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           NTH_VALUE(c_custkey, 2) OVER (PARTITION BY c_nationkey
                                         ORDER BY c_acctbal DESC, c_custkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND UNBOUNDED FOLLOWING) AS second_richest
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window family: percent_rank / cume_dist over the
    per-nation balance order, plus nth_value with an explicit
    whole-partition frame (the default running frame would make
    nth_value(…, 2) null until row 2 — a classic silent-wrong-answer;
    both engines get the same explicit frame)."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("c_custkey", 2).over(w_full).alias("second_richest"),
    )


@register(
    "q_cdc_apply",
    oracle=f"""
    WITH feed AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
        FROM {EVENTS_US}
    ),
    latest AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM feed
    )
    SELECT user_id, event_id AS last_event_id, ts AS last_ts, value AS last_value
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply: collapse a change feed (events as upserts, 'error'
    rows standing in for deletes) to the current snapshot — latest
    change per key wins, and keys whose latest change is a delete drop
    out. One window pass partitioned by key; at scale the feed shuffles
    once on user_id and each partition sorts independently, which is
    the standard merge-on-read compaction shape (Hudi/Iceberg
    upsert semantics re-expressed on plain parquet)."""
    e = load(spark, sf_dir, "events")
    feed = e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )
    # latest row per key as a hash aggregate (max_by over (ts, event_id)),
    # not a sort window: map-side partial combine moves one row per key
    # per partition through the shuffle — the shape a 100 TB CDC feed needs
    return (
        feed.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("event_id", "ts", "value", "op"),
                F.struct("ts", "event_id"),
            ).alias("r")
        )
        .filter(F.col("r.op") != "D")
        .select(
            "user_id",
            F.col("r.event_id").alias("last_event_id"),
            F.col("r.ts").alias("last_ts"),
            F.col("r.value").alias("last_value"),
        )
    )


@register(
    "q_scd2_dimension",
    oracle=f"""
    SELECT user_id, event_id, value, ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
           (LEAD(ts) OVER w IS NULL) AS is_current
    FROM {EVENTS_US}
    WHERE event_type IN ('signup', 'purchase')
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: each attribute-changing
    event becomes a version row with [valid_from, valid_to) validity,
    a per-key version number, and an is_current flag (open interval).
    lead() over the per-key timeline closes each interval without a
    self-join — one shuffle on the key, versus the naive
    event×event range join that is quadratic per key."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@register(
    "q_win_streaks",
    oracle=f"""
    WITH d AS (
        SELECT DISTINCT user_id, CAST(DATE_TRUNC('day', ts) AS DATE) AS d
        FROM {EVENTS_US}
    ),
    g AS (
        SELECT user_id, d,
               DATE_DIFF('day', DATE '1970-01-01', d)
               - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
        FROM d
    )
    SELECT user_id, MIN(d) AS streak_start, MAX(d) AS streak_end,
           COUNT(*) AS days
    FROM g GROUP BY user_id, grp
    ORDER BY user_id, streak_start
    """,
)
def q_win_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user runs of consecutive active days
    (retention/engagement streaks). The classic trick — day-number minus
    per-user row_number is constant within a run — turns island
    detection into a plain groupBy: one shuffle on user_id for the
    window, the grouping reuses the same partitioning, and nothing is
    ever self-joined (the naive formulation is a per-user range join).
    The epoch-day arithmetic keeps the island key an integer, identical
    in both engines."""
    e = load(spark, sf_dir, "events")
    d = e.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    g = d.withColumn(
        "grp",
        F.datediff(F.col("d"), F.lit("1970-01-01")) - F.row_number().over(w),
    )
    return (
        g.groupBy("user_id", "grp")
        .agg(
            F.min("d").alias("streak_start"),
            F.max("d").alias("streak_end"),
            F.count(F.lit(1)).alias("days"),
        )
        .drop("grp")
        .orderBy("user_id", "streak_start")
    )


@register(
    "q_retention_cohorts",
    oracle=f"""
    WITH s AS (
        SELECT user_id,
               CAST(DATE_TRUNC('month', MIN(ts)) AS TIMESTAMP) AS cohort
        FROM {EVENTS_US} WHERE event_type = 'signup' GROUP BY user_id
    ),
    size_ AS (SELECT cohort, COUNT(*) AS cohort_users FROM s GROUP BY cohort),
    act AS (
        SELECT DISTINCT e.user_id, s.cohort,
               DATE_DIFF('month', s.cohort,
                         CAST(DATE_TRUNC('month', e.ts) AS TIMESTAMP))
                   AS months_since
        FROM {EVENTS_US} e JOIN s ON e.user_id = s.user_id
        WHERE CAST(DATE_TRUNC('month', e.ts) AS TIMESTAMP) >= s.cohort
    )
    SELECT a.cohort, a.months_since,
           COUNT(*) AS active_users,
           ANY_VALUE(z.cohort_users) AS cohort_users,
           ROUND(COUNT(*) * 1.0 / ANY_VALUE(z.cohort_users), 4) AS retention
    FROM act a JOIN size_ z ON a.cohort = z.cohort
    GROUP BY a.cohort, a.months_since
    ORDER BY a.cohort, a.months_since
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users cohorted by first-signup month,
    retention = share of the cohort active in each subsequent month —
    the product-analytics staple. One aggregation builds the cohort
    table (tiny: one row per user), which then broadcasts into the
    event scan; activity dedup and the matrix are grouped aggs on
    (cohort, months_since), so the events table is scanned once and
    never self-joined. Month arithmetic stays on truncated timestamps
    (exact integers in both engines)."""
    e = load(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        # cast: date_trunc promotes NTZ to tz-aware TIMESTAMP; driver hasher
        # distinguishes the two (UTC session → value-exact cast)
        .agg(F.date_trunc("month", F.min("ts")).cast("timestamp_ntz").alias("cohort"))
    )
    size = s.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_users"))
    month = F.date_trunc("month", F.col("ts")).cast("timestamp_ntz")
    act = (
        e.join(F.broadcast(s), "user_id")
        .filter(month >= F.col("cohort"))
        .select(
            "user_id",
            "cohort",
            F.months_between(month, F.col("cohort")).cast("long")
                .alias("months_since"),
        )
        .distinct()
    )
    return (
        act.join(F.broadcast(size), "cohort")
        .groupBy("cohort", "months_since")
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.first("cohort_users").alias("cohort_users"),
            F.round(
                F.count(F.lit(1)) / F.first("cohort_users"), 4
            ).alias("retention"),
        )
        .orderBy("cohort", "months_since")
    )


@register(
    "q_win_time_weighted",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, value, epoch_us(ts) AS t_us,
               LEAD(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS t_next_us
        FROM {EVENTS_US}
    ),
    agg AS (
        SELECT user_id,
               CAST(SUM(CAST(ROUND(value * (t_next_us - t_us)) AS BIGINT))
                    AS BIGINT) AS wsum_u,
               CAST(SUM(t_next_us - t_us) AS BIGINT) AS dur_us
        FROM seq WHERE t_next_us IS NOT NULL
        GROUP BY user_id
    )
    SELECT user_id,
           CAST(ROUND(wsum_u / dur_us * 1000000.0) AS BIGINT) AS twa_e6,
           wsum_u, dur_us
    FROM agg WHERE dur_us > 0
    """,
)
def q_win_time_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user — the time-series aggregate that
    treats each observation as holding until the next one (step
    interpolation), so irregular sampling doesn't bias the mean the way
    a plain AVG does. One lead() window per user supplies each
    interval's length in exact integer microseconds; the weighted sum
    is then an ordinary map-side-combinable aggregate on the same
    partitioning, which Catalyst reuses (window shuffle = agg shuffle
    key). This is the continuous-aggregate shape TSDBs special-case,
    expressed as window + groupBy with no self-join.

    Bit-parity discipline (CORRECTNESS r3 hash-fail): the previous
    `SUM(value · dur)` summed raw DOUBLES — summation order differs
    between Spark partial aggregation and the oracle's scan order, so
    the last bits differ and no final ROUND can mask a value that
    straddles a rounding boundary. Each product is now rounded ONCE to
    an integer value-unit (`ROUND(value · dur_us)` → BIGINT; the
    product is the identical IEEE multiply on both engines and round()
    is half-away on both), making the sum exact and order-free, and
    the TWA is emitted as BIGINT micro-units from one identically-
    written div/mul/round chain. Zero raw doubles in the output row;
    callers derive the float TWA as twa_e6/1e6. The per-interval
    rounding perturbs each product by ≤0.5 value-units on magnitudes
    ~1e9 (µs intervals) — far below any consumer's precision, and
    determinism is what retries/speculation at 100 TB require.
    """
    ev = load(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ; session tz is UTC, so the cast is exact
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    t_next = F.lead(t_us).over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    seq = ev.select(
        "user_id",
        "value",
        t_us.alias("t_us"),
        t_next.alias("t_next_us"),
    ).filter(F.col("t_next_us").isNotNull())
    dur = F.col("t_next_us") - F.col("t_us")
    return (
        seq.groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * dur, 0).cast("long")).alias("wsum_u"),
            F.sum(dur).alias("dur_us"),
        )
        .filter(F.col("dur_us") > 0)
        .select(
            "user_id",
            F.round(F.col("wsum_u") / F.col("dur_us") * 1000000.0, 0)
            .cast("long")
            .alias("twa_e6"),
            "wsum_u",
            "dur_us",
        )
    )


@register(
    "q_gapfill_locf",
    oracle=f"""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, MAX(value) AS v
        FROM {EVENTS_US} ev GROUP BY user_id, CAST(ts AS DATE)
    ),
    bounds AS (
        SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
    ),
    spine AS (
        SELECT b.user_id, CAST(UNNEST(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS DATE) AS day
        FROM bounds b
    )
    SELECT s.user_id, s.day,
           ROUND(LAST_VALUE(d.v IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 4) AS v_filled,
           d.v IS NULL AS was_gap
    FROM spine s LEFT JOIN daily d
      ON s.user_id = d.user_id AND s.day = d.day
    """,
)
def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-series gap filling with LOCF (last observation
    carried forward): each user's daily series is densified over their
    own [first, last] day spine and missing days inherit the most
    recent observed value — the TSDB interpolation primitive, and the
    per-entity complement to `q_recursive_cte`'s global zero-filled
    spine. `was_gap` marks imputed rows for downstream audits.

    Scale shape: the spine is *generated* per user from a 2-column
    bounds aggregate (sequence+explode — no calendar table scan, and
    spine size is bounded by span, not event count); the fill is one
    `last(ignorenulls)` running window on the same user_id
    partitioning the join already established. No self-joins, no
    global spine materialization.
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select("user_id", F.to_date("ts").alias("day"), "value")
        .groupBy("user_id", "day")
        .agg(F.max("value").alias("v"))
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    j = spine.join(daily, ["user_id", "day"], "left")
    fill = F.last("v", ignorenulls=True).over(
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return j.select(
        "user_id",
        "day",
        F.round(fill, 4).alias("v_filled"),
        F.col("v").isNull().alias("was_gap"),
    )


@register(
    "q_win_attribution",
    oracle=f"""
    WITH e AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS t_us,
               CASE WHEN event_type <> 'purchase'
                    THEN printf('%020d|%09d', epoch_us(ts), event_id) END AS touch
        FROM {EVENTS_US} ev
    ),
    scored AS (
        SELECT event_id, user_id, event_type,
               MIN(touch) OVER w AS first_touch,
               MAX(touch) OVER w AS last_touch,
               COUNT(touch) OVER w AS n_touches
        FROM e
        WINDOW w AS (
            PARTITION BY user_id ORDER BY t_us
            RANGE BETWEEN 1800000000 PRECEDING AND 1 PRECEDING
        )
    )
    SELECT event_id AS purchase_id,
           -- TRY_CAST: DuckDB's split_part(NULL) is '' (not NULL), and
           -- CAST('' AS BIGINT) throws; TRY_CAST aligns with Spark's NULL
           TRY_CAST(SPLIT_PART(first_touch, '|', 2) AS BIGINT) AS first_touch_id,
           TRY_CAST(SPLIT_PART(last_touch, '|', 2) AS BIGINT) AS last_touch_id,
           n_touches
    FROM scored WHERE event_type = 'purchase'
    """,
)
def q_win_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch attribution: each purchase credits the
    earliest and latest non-purchase event by the same user in the
    preceding 30 minutes — one conditional MIN/MAX over a RANGE frame
    in event-time microseconds, no self-join (the naive formulation is
    an interval self-join like q_stream_join_interval plus two argmin
    passes). The candidate key is packed as a zero-padded
    '(t_us)|(event_id)' string so MIN/MAX order by time with the id as
    a deterministic tiebreak — window first()/last() over RANGE peers
    has no defined tie order, packed MIN/MAX does.

    Scale shape: one shuffle on user_id; the RANGE frame holds ≤30 min
    of one user's events. Every purchase is attributed in a single
    pass over the event stream.
    """
    ev = load(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    touch = F.when(
        F.col("event_type") != "purchase",
        F.format_string("%020d|%09d", t_us, F.col("event_id")),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(t_us)
        .rangeBetween(-1800 * 1_000_000, -1)
    )
    scored = ev.select(
        "event_id",
        "event_type",
        F.min(touch).over(w).alias("first_touch"),
        F.max(touch).over(w).alias("last_touch"),
        F.count(touch).over(w).alias("n_touches"),
    )
    return scored.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.split("first_touch", "\\|").getItem(1).cast("bigint").alias("first_touch_id"),
        F.split("last_touch", "\\|").getItem(1).cast("bigint").alias("last_touch_id"),
        "n_touches",
    )


@register(
    "q_win_transitions",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM {EVENTS_US}
    ),
    counts AS (
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
    FROM counts
    ORDER BY prev_type, next_type
    """,
)
def q_win_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event sequences:
    lag() pairs each event with its predecessor (one shuffle on
    user_id, deterministic (ts, event_id) order), counts collapse to a
    |types|² table, and row-normalization runs on that tiny table —
    the behavioral-model estimate funnel/attribution analyses start
    from. At 100 TB the only corpus-sized stages are the keyed window
    and a map-side-combinable count; normalization is driver-scale.
    The probability is one double division of exact ints, identical on
    both engines unrounded (the ROUND only stabilizes display).
    """
    ev = load(spark, sf_dir, "events")
    prev = F.lag("event_type").over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    counts = (
        ev.select("user_id", "event_type", prev.alias("prev_type"))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.select(
            "prev_type",
            "next_type",
            "n",
            F.round(
                F.col("n") / F.sum("n").over(W.partitionBy("prev_type")), 6
            ).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


#: sessionization inactivity gap: 30 minutes, in exact microseconds
_SESSION_GAP_US = 30 * 60 * 1_000_000


@register(
    "q_sessionize",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS t_us FROM {EVENTS_US} ev
    ),
    flagged AS (
        SELECT user_id, event_id, t_us,
               CASE WHEN LAG(t_us) OVER w IS NULL
                         OR t_us - LAG(t_us) OVER w > {_SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS is_new
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
    ),
    numbered AS (
        SELECT user_id, t_us,
               CAST(SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY t_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_seq
        FROM flagged
    )
    SELECT user_id, session_seq,
           COUNT(*) AS n_events,
           MIN(t_us) AS start_us,
           MAX(t_us) AS end_us,
           MAX(t_us) - MIN(t_us) AS dur_us
    FROM numbered
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization — the BATCH complement to
    `q_stream_session`'s streaming session window: per-user event
    streams are cut wherever inactivity exceeds 30 minutes (lag() gap
    test -> running SUM of session-start flags = session number), then
    each session is collapsed to count/start/end/duration. This is the
    clickstream primitive every warehouse implements as exactly this
    lag+cumsum idiom, and the batch path a 100 TB backfill would run
    (the streaming path handles the live tail).

    Scale shape: ONE data shuffle total — the lag window and the
    running sum share the identical (user_id | t_us, event_id)
    partitioning+ordering so both Window nodes ride a single
    hashpartitioning(user_id) exchange + sort, and the per-session
    aggregate needs NO further exchange because Catalyst recognizes
    hashpartitioning(user_id) satisfies ClusteredDistribution(user_id,
    session_seq) (grouping on a superset of the partition keys).
    Plan-asserted in tests/test_plans.py::test_sessionize_single_data_shuffle.
    No self-joins, no driver state; skewed power users are bounded by
    their own event counts, not the corpus.

    Parity: all-integer output row (epoch-µs longs, counts) — the
    FIXTURES.md "Oracle-parity conventions" discipline; BOTH windows
    (the lag gap test and the running session-number sum) carry the
    (t_us, event_id) secondary sort on both engines, because equal-
    timestamp siblings can straddle a session boundary and a tie-order
    difference would re-home them.
    """
    ev = load(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy("t_us", "event_id")
    flagged = ev.select(
        "user_id", "event_id", t_us.alias("t_us")
    ).select(
        "user_id",
        "event_id",
        "t_us",
        F.when(
            F.lag("t_us").over(w).isNull()
            | (F.col("t_us") - F.lag("t_us").over(w) > _SESSION_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    numbered = flagged.select(
        "user_id",
        "t_us",
        F.sum("is_new")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_seq"),
    )
    return (
        numbered.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("t_us").alias("start_us"),
            F.max("t_us").alias("end_us"),
            (F.max("t_us") - F.min("t_us")).alias("dur_us"),
        )
        .orderBy("user_id", "session_seq")
    )


@register(
    "q_mv_incremental",
    oracle=f"""
    WITH feed AS (
        SELECT user_id, event_id, ts, value, event_type,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
        FROM {EVENTS_US}
    ),
    snap AS (
        SELECT user_id, event_type, value FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) AS rn
            FROM feed)
        WHERE rn = 1 AND op <> 'D'
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CAST(ROUND(value * 10000.0) AS BIGINT)) AS BIGINT)
               AS total_value_tt
    FROM snap GROUP BY event_type
    """,
)
def q_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL VIEW MAINTENANCE with retractions: a per-event_type
    aggregate MV over the CDC snapshot (q_cdc_apply's latest-per-key,
    deletes drop out) is maintained as MV' = MV₀ + Δ instead of
    re-scanning the feed. The engine splits the feed at a 7-day cutoff:
    MV₀ aggregates the base snapshot; the delta batch identifies its
    TOUCHED keys; Δ = contrib(touched keys' new state) − contrib(touched
    keys' old state), merged into MV₀ by signed addition. Counts and
    integer-unit sums are algebraic, so retractions are exact: an
    update moves a user between groups (−1 here, +1 there) and a
    delete retracts entirely.

    The ORACLE is the full-feed recompute — the IVM correctness
    statement is precisely incremental ≡ recompute. 100 TB story: the
    base snapshot/feed is never re-aggregated — only delta keys move
    (one semi-join on the key + one keyed merge over touched state, all
    map-side-combinable); MV₀ is |groups| rows of standing state. This
    is the batch analog of q_stream_stateful's running aggregates and
    the maintenance tier above q_agg_incremental's append-only daily
    partials (which cannot retract)."""
    e = load(spark, sf_dir, "events")
    feed = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.round(F.col("value") * 10000.0, 0).cast("long").alias("v_tt"),
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )
    cut = e.agg((F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("cut"))
    return incremental_mv(feed, cut)


def incremental_mv(feed: DataFrame, cut: DataFrame) -> DataFrame:
    """Core of q_mv_incremental over any CDC feed relation
    (user_id, event_id, ts, event_type, v_tt, op) and a 1-row cutoff —
    split out so tests can drive edge corpora the fixture lacks
    (a group born only in the delta; a group fully retracted)."""
    feed = feed.crossJoin(F.broadcast(cut))
    base = feed.filter(F.col("ts") < F.col("cut")).drop("cut")
    delta = feed.filter(F.col("ts") >= F.col("cut")).drop("cut")

    def latest(df):
        return df.groupBy("user_id").agg(
            F.max_by(
                F.struct("event_type", "v_tt", "op"), F.struct("ts", "event_id")
            ).alias("r")
        )

    def contrib(state):
        return (
            state.filter(F.col("r.op") != "D")
            .groupBy(F.col("r.event_type").alias("event_type"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("r.v_tt").alias("s"),
            )
        )

    state0 = latest(base)
    mv0 = contrib(state0)

    touched = delta.select("user_id").distinct()
    old_touched = state0.join(touched, "user_id")
    # old state rows must re-enter the recency merge with their original
    # (ts, event_id); recover them by re-running latest() over base rows
    # of touched keys unioned with the delta batch
    base_touched = base.join(touched, "user_id")
    new_touched = latest(base_touched.unionByName(delta))

    d_old = contrib(old_touched).select(
        "event_type", (-F.col("n")).alias("dn"), (-F.col("s")).alias("ds")
    )
    d_new = contrib(new_touched).select(
        "event_type", F.col("n").alias("dn"), F.col("s").alias("ds")
    )
    deltas = d_old.unionByName(d_new).groupBy("event_type").agg(
        F.sum("dn").alias("dn"), F.sum("ds").alias("ds")
    )
    merged = (
        mv0.join(deltas, "event_type", "full_outer")
        .select(
            "event_type",
            (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0))).alias("n_users"),
            (F.coalesce(F.col("s"), F.lit(0)) + F.coalesce(F.col("ds"), F.lit(0))).alias("total_value_tt"),
        )
        .filter(F.col("n_users") > 0)
    )
    return merged


#: EWMA lookback: 8 events, weights 2^7..2^0 (halving decay)
_EWMA_K = 8


@register(
    "q_win_ewma",
    oracle=f"""
    WITH v AS (
        SELECT user_id, event_id, ts,
               CAST(ROUND(value * 10000.0) AS BIGINT) AS v_tt
        FROM {EVENTS_US}
    ),
    lagged AS (
        SELECT user_id, event_id,
               {" + ".join(
                   f"COALESCE(LAG(v_tt, {k}) OVER w * {1 << (7 - k)}, 0)"
                   for k in range(8)
               )} AS num,
               {" + ".join(
                   f"(CASE WHEN LAG(v_tt, {k}) OVER w IS NOT NULL"
                   f" THEN {1 << (7 - k)} ELSE 0 END)"
                   for k in range(8)
               )} AS den
        FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, CAST(num AS BIGINT) AS num,
           CAST(den AS BIGINT) AS den,
           num / CAST(den AS DOUBLE) AS ewma_tt
    FROM lagged
    """,
)
def q_win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user (halving decay
    over the last 8 events) — the smoothing signal behind rate/health
    monitors. The textbook recursive EWMA y_i = αx_i + (1−α)y_{i−1} is
    a sequential fold over FLOATS (order-dependent, not portable);
    this finite-lookback form keeps the exact semantics people want
    from λ=1/2 decay while staying in exact integer arithmetic: the
    numerator is Σ v_{i−k}·2^(7−k) over available lags (BIGINT), the
    denominator the matching weight sum, and the emitted average is ONE
    identical integer-ratio division — hash-safe raw double, and the
    window never re-sorts more than one partition pass per key."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    v_tt = F.round(F.col("value") * 10000.0, 0).cast("long")
    base = e.select("user_id", "event_id", "ts", v_tt.alias("v_tt"))
    num = sum(
        (
            F.coalesce(F.lag("v_tt", k).over(w) * (1 << (7 - k)), F.lit(0))
            for k in range(_EWMA_K)
        ),
        F.lit(0),
    )
    den = sum(
        (
            F.when(F.lag("v_tt", k).over(w).isNotNull(), 1 << (7 - k)).otherwise(0)
            for k in range(_EWMA_K)
        ),
        F.lit(0),
    )
    return base.select(
        "user_id",
        "event_id",
        num.cast("long").alias("num"),
        den.cast("long").alias("den"),
        (F.col("num") / F.col("den").cast("double")).alias("ewma_tt"),
    )


@register(
    "q_win_rolling_median",
    oracle=f"""
    WITH framed AS (
        SELECT user_id, event_id, ts, value,
               LIST_SORT(LIST(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
        FROM {EVENTS_US}
        -- value IS NOT NULL: Spark collect_list silently DROPS nulls
        -- while DuckDB LIST keeps them — a single null purchase value
        -- would desync frame sizes and median indices between engines
        WHERE event_type = 'purchase' AND value IS NOT NULL
    )
    SELECT user_id, event_id, ts,
           CAST(LEN(win) AS INTEGER) AS n_in_window,
           win[(LEN(win) + 1) // 2] + win[(LEN(win) + 2) // 2] AS med_x2
    FROM framed
    """,
)
def q_win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT median of the last 7 purchase values per user —
    the robust rolling statistic feature-engineering uses where a
    rolling mean would chase outliers. Median selection is explicit
    rank arithmetic on the sorted frame, never an interpolated
    percentile (those diverge at ties across engines), and the
    emission is the house med_x2 form: the sum of the one-or-two
    middle STORED values with a lone middle counted twice — one IEEE
    add of raw stored doubles, bit-identical on both engines
    (FIXTURES.md class (c); plain AVG of the two middles is the
    measured r3 hash-fail shape).

    Scale shape: one shuffle on user_id and a bounded ROWS frame —
    collect_list holds ≤ 7 values per row regardless of corpus size,
    so memory per row is constant and the sort is O(7 log 7) in
    codegen. The unique (ts, event_id) tiebreak keeps frame contents
    reproducible."""
    e = load(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, W.currentRow)
    )
    win = F.array_sort(F.collect_list("value").over(w))
    n = F.size(win)
    med_x2 = F.element_at(win, ((n + 1) / 2).cast("int")) + F.element_at(
        win, ((n + 2) / 2).cast("int")
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        n.alias("n_in_window"),
        med_x2.alias("med_x2"),
    )


@register(
    "q_pareto_frontier",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                             AS BIGINT)) AS BIGINT) AS spend_cents
        FROM orders GROUP BY o_custkey
    ),
    pts AS (
        SELECT c.c_custkey, c.c_nationkey,
               CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS bal_cents,
               COALESCE(s.spend_cents, 0) AS spend_cents
        FROM customer c LEFT JOIN spend s ON c.c_custkey = s.o_custkey
    )
    SELECT a.c_nationkey AS nation, a.c_custkey AS custkey,
           a.bal_cents, a.spend_cents
    FROM pts a
    WHERE NOT EXISTS (
        SELECT 1 FROM pts b
        WHERE b.c_nationkey = a.c_nationkey
          AND b.c_custkey <> a.c_custkey
          AND b.bal_cents >= a.bal_cents
          AND b.spend_cents >= a.spend_cents
          AND (b.bal_cents > a.bal_cents OR b.spend_cents > a.spend_cents)
    )
    ORDER BY nation, custkey
    """,
)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation PARETO FRONTIER (skyline) of customers on (account
    balance, lifetime spend) — the dominance query (Borzsony/Kossmann/
    Stocker 2001, public literature) the reference cannot express and a
    curation pipeline uses to pick non-dominated documents on
    (quality, freshness). The DEFINITION is quadratic (no other same-
    nation customer weakly better on both axes and strictly better on
    one) and the oracle states exactly that NOT-EXISTS; the Spark plan
    is the O(n log n) sort-based skyline instead: after one shuffle on
    the nation key, (1) a RANGE frame over bal_cents ([bal+1, +inf))
    takes the max spend among STRICTLY richer same-nation customers —
    exact because the axis is integer cents, so `1 FOLLOWING` is the
    open bound — and (2) a (nation, bal) partition max resolves
    equal-balance ties; a row survives iff no strictly-richer row
    spends >= it and it tops its own balance class. Two window passes
    over one partitioning, no self-join — at 100x the nation keys
    partition evenly and each window is a within-partition sort,
    versus the oracle formulation's O(n^2)-per-nation nested loop.
    Money handled as DECIMAL(12,2)->cents BIGINT on both engines
    (FIXTURES.md convention); customers with no orders enter at spend
    0 via the left join."""
    spend = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(12,2)") * 100)
                .cast("long")
            ).alias("spend_cents")
        )
    )
    pts = (
        load(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_nationkey",
            (F.col("c_acctbal").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("bal_cents"),
        )
        .join(spend, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            "c_nationkey",
            "bal_cents",
            F.coalesce("spend_cents", F.lit(0)).alias("spend_cents"),
        )
    )
    richer = (
        W.partitionBy("c_nationkey")
        .orderBy("bal_cents")
        .rangeBetween(1, W.unboundedFollowing)
    )
    same_bal = W.partitionBy("c_nationkey", "bal_cents")
    flagged = pts.select(
        "c_custkey",
        "c_nationkey",
        "bal_cents",
        "spend_cents",
        F.max("spend_cents").over(richer).alias("best_richer"),
        F.max("spend_cents").over(same_bal).alias("best_same_bal"),
    )
    return (
        flagged.filter(
            (F.col("best_richer").isNull()
             | (F.col("best_richer") < F.col("spend_cents")))
            & (F.col("spend_cents") == F.col("best_same_bal"))
        )
        .select(
            F.col("c_nationkey").alias("nation"),
            F.col("c_custkey").alias("custkey"),
            "bal_cents",
            "spend_cents",
        )
        .orderBy("nation", "custkey")
    )


@register(
    "q_ts_downsample_m4",
    oracle=f"""
    WITH pts AS (
        SELECT event_type,
               epoch_us(date_trunc('hour', ts)) AS bucket_us,
               epoch_us(ts) AS t_us, event_id,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS v_u
        FROM {EVENTS_US}
    ),
    rn AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY event_type, bucket_us
                                  ORDER BY t_us, event_id) AS rf,
               ROW_NUMBER() OVER (PARTITION BY event_type, bucket_us
                                  ORDER BY t_us DESC, event_id DESC) AS rl
        FROM pts
    )
    SELECT event_type, bucket_us,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(v_u) AS v_min_u, MAX(v_u) AS v_max_u,
           MAX(CASE WHEN rf = 1 THEN v_u END) AS v_first_u,
           MAX(CASE WHEN rl = 1 THEN v_u END) AS v_last_u,
           MIN(t_us) AS t_first_us, MAX(t_us) AS t_last_us
    FROM rn GROUP BY event_type, bucket_us
    ORDER BY event_type, bucket_us
    """,
)
def q_ts_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 VISUALIZATION DOWNSAMPLING (Jugel et al., VLDB 2014) of the
    events stream: per (series, pixel-bucket) emit exactly the four
    value-extrema a line renderer needs — first, last, min, max — plus
    the bucket's time extent. M4 is the error-free downsampling TSDBs
    special-case (a width-w chart drawn from the 4w-point M4 reduction
    is PIXEL-IDENTICAL to one drawn from all N points); here it is one
    hash aggregation: min/max are plain partial-aggregable extrema and
    first/last are `min_by`/`max_by` on the (t_us, event_id) composite
    struct — all map-side combinable, so at 100 TB the reduction runs
    at scan speed with a single shuffle of 4-value partials, no window
    sort and no per-series collect. The oracle states first/last
    positionally (double ROW_NUMBER + conditional aggregate) rather
    than re-using the struct-min_by formulation, so the two engines
    cross-check different plans for the same semantics. Values are
    ROUND(value*1e6)->BIGINT micro-units (scale-0 round of the
    identical IEEE product — the portable class per FIXTURES.md),
    times exact integer epoch-us; deterministic under ties via the
    event_id tiebreak."""
    ev = load(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    pts = ev.select(
        "event_type",
        F.unix_micros(F.date_trunc("hour", ts)).alias("bucket_us"),
        F.unix_micros(ts).alias("t_us"),
        "event_id",
        F.round(F.col("value") * 1000000.0, 0).cast("long").alias("v_u"),
    )
    ordkey = F.struct("t_us", "event_id")
    return (
        pts.groupBy("event_type", "bucket_us")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v_u").alias("v_min_u"),
            F.max("v_u").alias("v_max_u"),
            F.min_by("v_u", ordkey).alias("v_first_u"),
            F.max_by("v_u", ordkey).alias("v_last_u"),
            F.min("t_us").alias("t_first_us"),
            F.max("t_us").alias("t_last_us"),
        )
        .orderBy("event_type", "bucket_us")
    )


@register(
    "q_drift_cusum",
    oracle=f"""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS dy,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM {EVENTS_US} GROUP BY 1, 2
    ),
    k AS (
        SELECT event_type,
               SUM(x) // COUNT(*) AS mu
        FROM d GROUP BY event_type
    ),
    p AS (
        SELECT d.event_type, d.dy, d.x, k.mu,
               CAST(SUM(d.x - k.mu) OVER (
                   PARTITION BY d.event_type ORDER BY d.dy
               ) AS BIGINT) AS pt
        FROM d JOIN k USING (event_type)
    ),
    s AS (
        SELECT event_type, dy, x, mu, pt,
               pt - LEAST(CAST(0 AS BIGINT), CAST(MIN(pt) OVER (
                   PARTITION BY event_type ORDER BY dy
               ) AS BIGINT)) AS st
        FROM p
    )
    SELECT event_type, dy AS day, x AS n_events,
           CAST(st AS BIGINT) AS cusum,
           st >= mu // 2 AS alarm
    FROM s ORDER BY event_type, day
    """,
)
def q_drift_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM CHANGEPOINT DETECTION (Page 1954) on daily event
    counts per series — the drift monitor that reacts to small
    sustained shifts the per-day KS/chi-sq snapshots
    (q_drift_ks/q_split_drift_chisq) integrate away. The textbook
    recurrence S_t = max(0, S_{t-1} + (x_t - mu)) is SEQUENTIAL — the
    naive port is an applyInPandas per-series scan in Python — but it
    has the exact closed form S_t = P_t - min(0, min_{j<=t} P_j) over
    the deviation prefix sums P, so the whole detector becomes two
    cumulative windows on one (event_type) partitioning: a running SUM
    and a running MIN — whole-stage-codegen JVM ops, one shuffle, no
    Python, and at 100 TB each series' window is independent and the
    partitions are day-count-bounded. All-integer math: mu is the
    integer-division mean daily count (total DIV days), deviations and
    prefix sums are exact BIGINTs, and the alarm threshold is mu DIV 2
    — the oracle's windowed SUM is CAST to BIGINT before arithmetic
    (the DuckDB HUGEINT/pandas-float64 hazard, CORRECTNESS r4)."""
    ev = load(spark, sf_dir, "events")
    d = (
        ev.groupBy(
            "event_type", F.to_date(F.col("ts").cast("timestamp")).alias("dy")
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    k = d.groupBy("event_type").agg(
        F.expr("SUM(x) DIV COUNT(*)").alias("mu")
    )
    byday = W.partitionBy("event_type").orderBy("dy")
    p = (
        d.join(k, "event_type")
        .withColumn("pt", F.sum(F.col("x") - F.col("mu")).over(byday))
    )
    st = F.col("pt") - F.least(F.lit(0).cast("long"), F.min("pt").over(byday))
    return (
        p.select(
            "event_type",
            F.col("dy").alias("day"),
            F.col("x").alias("n_events"),
            st.alias("cusum"),
            (st >= F.expr("mu DIV 2")).alias("alarm"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "q_ts_autocorr",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               SUM(CAST(ROUND(o_totalprice, 0) AS BIGINT)) AS rev
        FROM orders GROUP BY 1
    ),
    c AS (SELECT SUM(rev) // COUNT(*) AS mu FROM daily),
    dd AS (SELECT day, rev - (SELECT mu FROM c) AS x FROM daily),
    lags AS (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7)) l(k)),
    pairs AS (
        SELECT l.k, a.x AS x, b.x AS y
        FROM dd a
        JOIN lags l ON TRUE
        JOIN dd b ON b.day = a.day + CAST(l.k AS INTEGER)
    ),
    s AS (
        SELECT k, COUNT(*) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM pairs GROUP BY k
    )
    SELECT k AS lag_days, CAST(n AS BIGINT) AS n_pairs,
           CAST(ROUND(1000000.0 * (
               CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
           ) / (
               SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
           ), 0) AS BIGINT) AS ac_micro
    FROM s ORDER BY lag_days
    """,
)
def q_ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG AUTOCORRELATION (lags 1-7 days) of the daily order-revenue
    series — the seasonality probe every time-series pipeline runs
    before choosing window sizes. Numerically engineered for exact
    cross-engine parity at scale: (1) revenue is integerized PER ORDER
    (scale-0 ROUND of the raw double — dyadic midpoints, portable) so
    the daily SUM is order-independent int64 arithmetic; (2) the series
    is shifted by the integer floor-mean BEFORE the moment sums —
    autocorrelation is shift-invariant, and centering shrinks per-term
    squares from ~rev² to ~deviation², keeping SUM(x*x) inside int64
    headroom even at 1000× this fixture (uncentered dollars overflow
    near sf 1); (3) the Pearson ratio is then a single identical
    double expression over exact int64 scalars (*, -, /, and IEEE-754
    SQRT are all correctly rounded, so both engines produce the same
    bits), emitted as scale-0-rounded micro-units — an all-integer
    row. The lag join is a calendar self-equi-join on (day + k), not a
    global-order window: it shuffles on the date key and scales out,
    where LAG over an unpartitioned ORDER BY day would serialize on
    one reducer. TPC-H order dates are dense, so calendar lag equals
    row lag here. Reference analog: none — target-only capability."""
    orders = load(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.round("o_totalprice", 0).cast("long")).alias("rev")
        )
    )
    mu = daily.agg(
        F.expr("sum(rev) DIV count(*)").alias("mu")
    ).collect()[0][0]
    dd = daily.select("day", (F.col("rev") - F.lit(mu)).alias("x"))
    lags = spark.range(1).select(
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("k")
    )
    a = dd.select(F.col("day").alias("aday"), F.col("x").alias("x"))
    b = dd.select(F.col("day").alias("bday"), F.col("x").alias("y"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .withColumn("tday", F.date_add(F.col("aday"), F.col("k")))
        .join(b, F.col("bday") == F.col("tday"))
    )
    s = pairs.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = (
        F.col("n").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    )
    den = F.sqrt(
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    ) * F.sqrt(
        F.col("n").cast("double") * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    return (
        s.select(
            F.col("k").alias("lag_days"),
            F.col("n").alias("n_pairs"),
            F.round(F.lit(1000000.0) * num / den, 0)
            .cast("long")
            .alias("ac_micro"),
        )
        .orderBy("lag_days")
    )


@register(
    "q_ts_seasonal_dow",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               EXTRACT(YEAR FROM o_orderdate) AS yr,
               SUM(CAST(ROUND(o_totalprice, 0) AS BIGINT)) AS rev
        FROM orders GROUP BY 1, 2
    ),
    ma AS (
        SELECT day, yr, rev,
               SUM(rev) OVER (
                   PARTITION BY yr ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
               ) AS sum7,
               COUNT(*) OVER (
                   PARTITION BY yr ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
               ) AS w
        FROM daily
    ),
    det AS (
        SELECT (day - DATE '1970-01-01') % 7 AS dow,
               7 * rev - sum7 AS det7
        FROM ma WHERE w = 7
    )
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(det7) AS BIGINT) AS sum_det7,
           CAST(SUM(det7) * 1000000 // (7 * COUNT(*)) AS BIGINT)
               AS seasonal_micro
    FROM det GROUP BY dow ORDER BY dow
    """,
)
def q_ts_seasonal_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAY-OF-WEEK SEASONAL DECOMPOSITION of daily order revenue — the
    classical moving-average decomposition (trend = centered 7-day MA,
    seasonal index = mean deviation from trend per weekday) in EXACT
    RATIONAL ALGEBRA: instead of the float trend rev - sum7/7, the
    deviation is kept as the integer 7*rev - sum7 (scaled by 7) so the
    per-weekday aggregation is exact int64 arithmetic end to end, and
    the final index divides by 7*n once, as integer micro-unit floor
    division. Weekday is epoch-day mod 7 (portable across engines —
    named DOW functions disagree on week start). The centered window
    partitions by YEAR, so at scale the sort is per-year-partition
    rather than one global ordered reducer; boundary days without a
    full 7-day window inside their year are excluded (w = 7), which
    also removes the asymmetric-window bias at the series edges.
    Emissions all-integer. TPC-H order dates are synthetic-uniform, so
    indices hover near zero — the operator's value is the exact
    decomposition dataflow, documented against the fixture. Reference
    analog: none — target-only capability."""
    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day"),
        F.year("o_orderdate").alias("yr"),
    ).agg(F.sum(F.round("o_totalprice", 0).cast("long")).alias("rev"))
    w7 = W.partitionBy("yr").orderBy("day").rowsBetween(-3, 3)
    ma = daily.select(
        "day", "rev",
        F.sum("rev").over(w7).alias("sum7"),
        F.count(F.lit(1)).over(w7).alias("w"),
    ).filter(F.col("w") == 7)
    det = ma.select(
        (F.datediff("day", F.lit("1970-01-01")) % 7).cast("long").alias("dow"),
        (F.lit(7) * F.col("rev") - F.col("sum7")).alias("det7"),
    )
    return (
        det.groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("det7").alias("sum_det7"),
        )
        .select(
            "dow", "n_days", "sum_det7",
            # sum_det7 can be NEGATIVE: both Spark DIV and DuckDB //
            # truncate toward zero on integers (verified: -7//2 = -3 in
            # DuckDB), so plain integer division is portable even here
            F.expr("sum_det7 * 1000000 DIV (7 * n_days)").alias(
                "seasonal_micro"
            ),
        )
        .orderBy("dow")
    )


@register(
    "q_win_rolling_slope",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM {EVENTS_US} GROUP BY 1, 2
    ),
    o AS (
        SELECT event_type, day, y,
               DATE_DIFF('day', DATE '1970-01-01', day) AS t
        FROM daily
    ),
    w AS (
        SELECT event_type, day, t, y,
               SUM(y) OVER win AS a,
               SUM(t * y) OVER win AS b,
               COUNT(*) OVER win AS n,
               MIN(t) OVER win AS t0,
               MAX(t) OVER win AS t6
        FROM o
        WINDOW win AS (
            PARTITION BY event_type ORDER BY day
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
        )
    )
    SELECT event_type, day,
           CAST((7 * (b - t0 * a) - 21 * a) * 1000000 // 196 AS BIGINT)
               AS slope_micro_per_day
    FROM w
    WHERE n = 7 AND t6 - t0 = 6
    ORDER BY event_type, day
    """,
)
def q_win_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING OLS TREND SLOPE (trailing 7 days) of daily event counts
    per event type — the rate-of-change monitor behind every 'is this
    metric accelerating' alert, in EXACT INTEGER ALGEBRA: with the
    regressor fixed at offsets 0..6 the OLS denominator is the
    constant 196 and the numerator reduces to 7*(B - t0*A) - 21*A
    where A = SUM(y) and B = SUM(t*y) over the trailing window (t =
    epoch-day ordinal) — two integer window sums, no per-offset
    weights, no floats; the slope emits as micro-events/day via
    integer division (both engines truncate signed division toward
    zero — verified block 7). Windows partition by event type; rows
    without a full GAPLESS 7-day history (n = 7 AND t-span = 6) are
    excluded so the closed form's offset assumption holds exactly.
    Reference analog: none — target-only capability."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    o = daily.select(
        "event_type", "day", "y",
        F.datediff("day", F.lit("1970-01-01")).cast("long").alias("t"),
    )
    win = (
        W.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    )
    w = o.select(
        "event_type", "day",
        F.sum("y").over(win).alias("a"),
        F.sum(F.col("t") * F.col("y")).over(win).alias("b"),
        F.count(F.lit(1)).over(win).alias("n"),
        F.min("t").over(win).alias("t0"),
        F.max("t").over(win).alias("t6"),
    )
    return (
        w.filter((F.col("n") == 7) & (F.col("t6") - F.col("t0") == 6))
        .select(
            "event_type", "day",
            F.expr(
                "(7 * (b - t0 * a) - 21 * a) * 1000000 DIV 196"
            ).alias("slope_micro_per_day"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "q_ts_outlier_rolling",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM {EVENTS_US} GROUP BY 1, 2
    ),
    w AS (
        SELECT event_type, day, y,
               SUM(y) OVER win AS s,
               SUM(y * y) OVER win AS sxx,
               COUNT(*) OVER win AS n
        FROM daily
        WINDOW win AS (
            PARTITION BY event_type ORDER BY day
            ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING
        )
    )
    SELECT event_type, day, y,
           CAST(n AS BIGINT) AS baseline_n,
           CAST(s AS BIGINT) AS baseline_sum,
           CAST(ROUND(1000000.0 *
               (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(y AS DOUBLE)
                    - CAST(s AS DOUBLE))
                   * (CAST(n AS DOUBLE) * CAST(y AS DOUBLE)
                      - CAST(s AS DOUBLE)))
               / (CAST(n AS DOUBLE)
                  * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))), 0)
               AS BIGINT) AS z2_micro
    FROM w
    WHERE n >= 7
      AND n * (n * y - s) * (n * y - s) > 4 * n * (n * sxx - s * s)
    ORDER BY event_type, day
    """,
)
def q_ts_outlier_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING Z-SCORE OUTLIER ALARMS on daily event counts — the
    standard 'is today anomalous vs the trailing baseline' monitor: a
    day alarms when its count departs the TRAILING 14-day window (the
    current day is EXCLUDED from its own baseline — 14 PRECEDING TO 1
    PRECEDING — the self-contamination mistake naive implementations
    make) by more than 2 sample standard deviations. The alarm
    predicate is EXACT INTEGER ARITHMETIC via squared
    cross-multiplication — n*(n*y - s)^2 > k^2 * n*(n*sxx - s^2)
    with k = 2 — so the decision never touches a float at any scale;
    the reported z^2 magnitude is the identical-IEEE micro emission
    (integer cross-mult would overflow int64 at ~1000x this fixture —
    same analysis as q_graph_modularity). Windows partition by event
    type; warm-up rows (n < 7) are excluded. 13 alarm rows at sf0.01.
    Completes the anomaly family: q_agg_mad_outliers (static robust),
    q_drift_cusum (sequential drift), THIS (rolling z). Reference
    analog: none — target-only capability."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    win = W.partitionBy("event_type").orderBy("day").rowsBetween(-14, -1)
    w = daily.select(
        "event_type", "day", "y",
        F.sum("y").over(win).alias("s"),
        F.sum(F.col("y") * F.col("y")).over(win).alias("sxx"),
        F.count(F.lit(1)).over(win).alias("n"),
    )

    def d(c: str):
        return F.col(c).cast("double")

    z2 = (
        d("n") * (d("n") * d("y") - d("s")) * (d("n") * d("y") - d("s"))
    ) / (d("n") * (d("n") * d("sxx") - d("s") * d("s")))
    alarm = (
        F.col("n") * (F.col("n") * F.col("y") - F.col("s"))
        * (F.col("n") * F.col("y") - F.col("s"))
        > 4 * F.col("n")
        * (F.col("n") * F.col("sxx") - F.col("s") * F.col("s"))
    )
    return (
        w.filter((F.col("n") >= 7) & alarm)
        .select(
            "event_type", "day", "y",
            F.col("n").alias("baseline_n"),
            F.col("s").alias("baseline_sum"),
            F.round(F.lit(1000000.0) * z2, 0).cast("long").alias("z2_micro"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "q_agg_cohort_ltv",
    oracle=f"""
    WITH first_signup AS (
        SELECT user_id,
               CAST(DATE_TRUNC('day', MIN(ts)) AS DATE) AS cohort
        FROM {EVENTS_US} WHERE event_type = 'signup' GROUP BY 1
    ),
    purchases AS (
        SELECT f.cohort,
               DATE_DIFF('day', f.cohort,
                         CAST(DATE_TRUNC('day', p.ts) AS DATE)) AS age_days,
               CAST(ROUND(p.value * 10000.0) AS BIGINT) AS v_tt
        FROM {EVENTS_US} p
        JOIN first_signup f ON p.user_id = f.user_id
        WHERE p.event_type = 'purchase' AND p.ts >= CAST(f.cohort AS TIMESTAMP)
    ),
    cell AS (
        SELECT cohort, CAST(age_days AS BIGINT) AS age_days,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(v_tt) AS BIGINT) AS rev_tt
        FROM purchases GROUP BY 1, 2
    )
    SELECT cohort, age_days, n_purchases, rev_tt,
           CAST(SUM(rev_tt) OVER (
               PARTITION BY cohort ORDER BY age_days
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_rev_tt
    FROM cell ORDER BY cohort, age_days
    """,
)
def q_agg_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHORT LIFETIME VALUE — cumulative purchase revenue by signup
    cohort and account age, the growth-analytics staple beside
    q_retention_cohorts (which counts activity; THIS sums revenue):
    each user joins the cohort of their first signup DAY, purchases on
    or after it bucket by day-age, and per-cohort cumulative revenue
    runs over the age axis. Revenue integerizes per event (x1e4
    ten-thousandths, the q_sink_parquet_partitioned convention for the
    events value column) so every sum is exact int64. Dataflow: one
    min-aggregation for cohort assignment, a user-keyed equi-join to
    attribute purchases (the fact shuffle), one (cohort, age) hash
    aggregation, then the cumulative window partitioned by cohort —
    cohort cardinality grows with time, not data volume, so the window
    partitions stay narrow at 100 TB. Pre-signup purchases are
    excluded (ts >= cohort), matching the LTV definition. All-integer
    emissions. Reference analog: none — target-only capability."""
    ev = load(spark, sf_dir, "events")
    first_signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.to_date(F.min("ts")).alias("cohort"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_signup, "user_id")
        .filter(F.col("ts") >= F.col("cohort").cast("timestamp"))
        .select(
            "cohort",
            F.datediff(F.to_date("ts"), F.col("cohort"))
            .cast("long")
            .alias("age_days"),
            F.round(F.col("value") * 10000.0).cast("long").alias("v_tt"),
        )
    )
    cell = purchases.groupBy("cohort", "age_days").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("v_tt").alias("rev_tt"),
    )
    win = (
        W.partitionBy("cohort")
        .orderBy("age_days")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        cell.select(
            "cohort", "age_days", "n_purchases", "rev_tt",
            F.sum("rev_tt").over(win).alias("cum_rev_tt"),
        )
        .orderBy("cohort", "age_days")
    )


@register(
    "q_funnel_multistep",
    oracle=f"""
    WITH ev AS (SELECT * FROM {EVENTS_US}),
    s AS (
        SELECT s.user_id, s.ts,
               EXISTS (
                   SELECT 1 FROM ev v
                   WHERE v.user_id = s.user_id AND v.event_type = 'view'
                     AND v.ts >= s.ts
                     AND v.ts <= s.ts + INTERVAL '30 minutes'
               ) AS reached_view,
               EXISTS (
                   SELECT 1 FROM ev v
                   WHERE v.user_id = s.user_id AND v.event_type = 'view'
                     AND v.ts >= s.ts
                     AND v.ts <= s.ts + INTERVAL '30 minutes'
                     AND EXISTS (
                         SELECT 1 FROM ev p
                         WHERE p.user_id = v.user_id
                           AND p.event_type = 'purchase'
                           AND p.ts >= v.ts
                           AND p.ts <= v.ts + INTERVAL '30 minutes'
                     )
               ) AS reached_purchase
        FROM ev s WHERE s.event_type = 'signup'
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_signups,
           CAST(SUM(CASE WHEN reached_view THEN 1 ELSE 0 END) AS BIGINT)
               AS n_reached_view,
           CAST(SUM(CASE WHEN reached_purchase THEN 1 ELSE 0 END) AS BIGINT)
               AS n_reached_purchase
    FROM s GROUP BY user_id ORDER BY user_id
    """,
)
def q_funnel_multistep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE-STEP FUNNEL (signup -> view within 30 min -> purchase
    within 30 min OF THAT VIEW), per user — the staged-conversion
    report q_funnel_conversion's two-step version cannot express.
    Scalable formulation, zero self-joins: (1) one backward
    user-timeline pass marks each view CONVERTING if the nearest later
    purchase falls inside its window; (2) a second backward pass
    carries, for every signup, the nearest later view AND the nearest
    later CONVERTING view — 'some view in the signup window converts'
    is equivalent to 'the NEAREST converting view is in the window'
    (nearest minimizes the timestamp), which is what makes the carry
    formulation exact against the doubly-correlated EXISTS oracle.
    Two shuffles on user_id total, any data size; the oracle's nested
    EXISTS would be a quadratic correlated scan at scale. All-integer
    emissions. Reference analog: none — target-only capability."""
    e = load(spark, sf_dir, "events")
    pu = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(0).alias("is_view"),
        F.col("ts").alias("p_ts"),
    )
    vw = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(1).alias("is_view"),
        F.lit(None).cast("timestamp_ntz").alias("p_ts"),
    )
    w1 = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_view").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    views = (
        vw.unionByName(pu)
        .select(
            "*",
            F.last("p_ts", ignorenulls=True).over(w1).alias("np"),
        )
        .filter(F.col("is_view") == 1)
        .select(
            "user_id", "ts",
            (
                F.col("np").isNotNull()
                & (F.col("np") <= F.col("ts") + F.expr("INTERVAL 30 MINUTES"))
            ).alias("v_conv"),
        )
    )
    su = e.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.lit(1).alias("is_signup"),
        F.lit(None).cast("timestamp_ntz").alias("v_ts"),
        F.lit(None).cast("timestamp_ntz").alias("cv_ts"),
    )
    vrows = views.select(
        "user_id", "ts", F.lit(0).alias("is_signup"),
        F.col("ts").alias("v_ts"),
        F.when(F.col("v_conv"), F.col("ts")).alias("cv_ts"),
    )
    w2 = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_signup").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = su.unionByName(vrows).select(
        "*",
        F.last("v_ts", ignorenulls=True).over(w2).alias("nv"),
        F.last("cv_ts", ignorenulls=True).over(w2).alias("ncv"),
    )
    lim = F.col("ts") + F.expr("INTERVAL 30 MINUTES")
    return (
        carried.filter(F.col("is_signup") == 1)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.sum(
                F.when(
                    F.col("nv").isNotNull() & (F.col("nv") <= lim), 1
                ).otherwise(0)
            ).alias("n_reached_view"),
            F.sum(
                F.when(
                    F.col("ncv").isNotNull() & (F.col("ncv") <= lim), 1
                ).otherwise(0)
            ).alias("n_reached_purchase"),
        )
        .orderBy("user_id")
    )


@register(
    "q_win_time_to_convert",
    oracle=f"""
    WITH ev AS (SELECT * FROM {EVENTS_US}),
    su AS (
        SELECT s.user_id, s.ts,
               (SELECT MIN(p.ts) FROM ev p
                WHERE p.user_id = s.user_id AND p.event_type = 'purchase'
                  AND p.ts >= s.ts) AS first_purchase
        FROM ev s WHERE s.event_type = 'signup'
    ),
    lat AS (
        SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
               CAST(DATE_DIFF('second', ts, first_purchase) AS BIGINT)
                   AS latency_s
        FROM su WHERE first_purchase IS NOT NULL
    ),
    f AS (
        SELECT day, latency_s, COUNT(*) AS cnt FROM lat GROUP BY 1, 2
    ),
    w AS (
        SELECT day, latency_s,
               SUM(cnt) OVER (PARTITION BY day ORDER BY latency_s) AS cw,
               SUM(cnt) OVER (PARTITION BY day) AS tw
        FROM f
    )
    SELECT day,
           CAST(MAX(tw) AS BIGINT) AS n_conversions,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN latency_s END) AS BIGINT)
               AS p50_s,
           CAST(MIN(CASE WHEN 10 * cw >= 9 * tw THEN latency_s END)
               AS BIGINT) AS p90_s
    FROM w GROUP BY day ORDER BY day
    """,
)
def q_win_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TO-CONVERT DISTRIBUTION — exact p50/p90 of the
    signup-to-first-purchase latency per signup day, the funnel
    family's 'how fast' companion (q_funnel_conversion answers
    'whether'). The nearest later purchase comes from the backward
    user-timeline carry (one user shuffle — the oracle's correlated
    MIN subquery is the quadratic formulation this avoids); latencies
    integerize to whole seconds (timestamps are µs-truncated by the
    catalog staging, the difference is exact); percentiles are the
    exact lower-quantile cross-multiplications (2*cw >= tw, 10*cw >=
    9*tw — no float quantile interpolation) over distinct-latency
    cells, the q_agg_percentile_exact machinery partitioned by day.
    All-integer emissions. Reference analog: none — target-only
    capability."""
    e = load(spark, sf_dir, "events")
    su = e.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.lit(1).alias("is_signup"),
        F.lit(None).cast("timestamp_ntz").alias("p_ts"),
    )
    pu = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(0).alias("is_signup"),
        F.col("ts").alias("p_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_signup").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    lat = (
        su.unionByName(pu)
        .select(
            "*",
            F.last("p_ts", ignorenulls=True).over(w).alias("np"),
        )
        .filter((F.col("is_signup") == 1) & F.col("np").isNotNull())
        .select(
            F.to_date("ts").alias("day"),
            (
                F.unix_timestamp("np") - F.unix_timestamp("ts")
            ).cast("long").alias("latency_s"),
        )
    )
    f = lat.groupBy("day", "latency_s").agg(F.count(F.lit(1)).alias("cnt"))
    wc = W.partitionBy("day").orderBy("latency_s")
    wt = W.partitionBy("day")
    ww = f.select(
        "day", "latency_s",
        F.sum("cnt").over(wc).alias("cw"),
        F.sum("cnt").over(wt).alias("tw"),
    )
    return (
        ww.groupBy("day")
        .agg(
            F.max("tw").alias("n_conversions"),
            F.min(
                F.when(2 * F.col("cw") >= F.col("tw"), F.col("latency_s"))
            ).alias("p50_s"),
            F.min(
                F.when(
                    10 * F.col("cw") >= 9 * F.col("tw"), F.col("latency_s")
                )
            ).alias("p90_s"),
        )
        .orderBy("day")
    )


@register(
    "q_win_drawdown",
    oracle="""
    WITH seq AS (
        SELECT o_custkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderdate, o_orderkey
        FROM orders
    ),
    bal AS (
        SELECT o_custkey, o_orderdate, o_orderkey,
               CAST(SUM(cents) OVER w AS BIGINT) AS bal
        FROM seq
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    run AS (
        SELECT o_custkey, bal,
               CAST(MAX(bal) OVER w AS BIGINT) AS peak
        FROM bal
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MAX(peak) AS BIGINT) AS peak_cents,
           CAST(MAX(peak - bal) AS BIGINT) AS max_drawdown_cents
    FROM run
    GROUP BY o_custkey
    HAVING COUNT(*) >= 8
    ORDER BY o_custkey
    """,
)
def q_win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX DRAWDOWN per customer — the risk metric a revenue/quota
    pipeline computes over every account's cumulative order series:
    largest peak-to-trough drop of the running total. Two stacked
    cumulative frames over ONE window spec (running sum, then running
    max of that sum) — Catalyst plans a single hash-partition +
    per-partition sort per customer, no second shuffle, and the final
    per-customer reduction reuses the same partitioning. The oracle's
    nested `MAX(SUM() OVER w) OVER w` is the same two-pass-over-one-sort
    shape. Integer cents end to end; HAVING >= 8 keeps the emission to
    engaged accounts (non-vacuous at sf0.001's ~100 customers).
    Reference analog: none — target-only capability."""
    orders = load(spark, sf_dir, "orders")
    seq = orders.select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderdate",
        "o_orderkey",
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    bal = seq.select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        F.sum("cents").over(w).alias("bal"),
    )
    run = bal.select(
        "o_custkey",
        "bal",
        F.max("bal").over(w).alias("peak"),
    )
    return (
        run.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max("peak").alias("peak_cents"),
            F.max(F.col("peak") - F.col("bal")).alias("max_drawdown_cents"),
        )
        .filter(F.col("n_orders") >= 8)
        .orderBy("o_custkey")
    )


@register(
    "q_ts_interpolate_linear",
    oracle=f"""
    WITH obs AS (
        SELECT user_id,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM {EVENTS_US} GROUP BY 1, 2
    ),
    span AS (
        SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM obs GROUP BY 1
    ),
    cal AS (
        SELECT user_id, UNNEST(GENERATE_SERIES(d0, d1)) AS d FROM span
    ),
    joined AS (
        SELECT cal.user_id, cal.d, obs.cents FROM cal
        LEFT JOIN obs ON obs.user_id = cal.user_id AND obs.d = cal.d
    ),
    filled AS (
        SELECT user_id, d, cents,
               LAST_VALUE(cents IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS v_prev,
               LAST_VALUE(CASE WHEN cents IS NOT NULL THEN d END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS d_prev,
               FIRST_VALUE(cents IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS v_next,
               FIRST_VALUE(CASE WHEN cents IS NOT NULL THEN d END
                           IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS d_next
        FROM joined
    )
    SELECT user_id, d,
           CAST(CASE WHEN cents IS NOT NULL THEN cents
                ELSE v_prev + (v_next - v_prev) * (d - d_prev)
                     // (d_next - d_prev) END AS BIGINT) AS cents,
           (cents IS NULL) AS interpolated
    FROM filled
    ORDER BY user_id, d
    """,
)
def q_ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR-INTERPOLATION GAP FILL — the complement to
    q_gapfill_locf: missing days in each user's daily-revenue series
    are filled with the straight line between the neighboring
    observations, v_prev + (v_next-v_prev)*(d-d_prev) DIV
    (d_next-d_prev), in INTEGER cents with truncating division
    (portable: Spark DIV and DuckDB // both truncate toward zero, and
    the numerator product stays within int64 for any gap < ~1e5 days at
    full-noise cent sums). Dataflow: one hash-aggregate to (user, day),
    a per-user calendar via sequence()/explode (output scales with
    span, not raw events), a co-partitioned left join, and TWO
    IGNORE-NULLS window passes (forward last_value, backward
    first_value) over one per-user sort — the standard
    as-of-fill plan shape. Endpoints are always observed (the calendar
    spans each user's own min..max day), so interior gaps always have
    both neighbors. Emits the dense series with an `interpolated`
    flag. Reference analog: none — target-only capability."""
    ev = load(spark, sf_dir, "events")
    obs = (
        ev.select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
            .cast("long")
            .alias("d"),
            F.round(F.col("value") * 100).cast("long").alias("v"),
        )
        .groupBy("user_id", "d")
        .agg(F.sum("v").alias("cents"))
    )
    span = obs.groupBy("user_id").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    cal = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("d")
    )
    joined = cal.join(obs, ["user_id", "d"], "left")
    w_fwd = (
        W.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_bwd = (
        W.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(0, W.unboundedFollowing)
    )
    d_obs = F.when(F.col("cents").isNotNull(), F.col("d"))
    filled = joined.select(
        "user_id",
        "d",
        "cents",
        F.last("cents", ignorenulls=True).over(w_fwd).alias("v_prev"),
        F.last(d_obs, ignorenulls=True).over(w_fwd).alias("d_prev"),
        F.first("cents", ignorenulls=True).over(w_bwd).alias("v_next"),
        F.first(d_obs, ignorenulls=True).over(w_bwd).alias("d_next"),
    )
    interp = F.expr(
        "v_prev + (v_next - v_prev) * (d - d_prev) DIV (d_next - d_prev)"
    )
    return filled.select(
        "user_id",
        "d",
        F.when(F.col("cents").isNotNull(), F.col("cents"))
        .otherwise(interp)
        .alias("cents"),
        F.col("cents").isNull().alias("interpolated"),
    ).orderBy("user_id", "d")


@register(
    "q_ts_resample_weekly",
    oracle="""
    WITH weekly AS (
        SELECT o_orderpriority AS grp,
               CAST(DATE_TRUNC('week', CAST(o_orderdate AS DATE)) AS DATE)
                   AS week_start,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS revenue_c
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        GROUP BY 1, 2
    )
    SELECT grp, week_start, n_orders, revenue_c,
           CAST(revenue_c - COALESCE(LAG(revenue_c) OVER (
               PARTITION BY grp ORDER BY week_start), 0) AS BIGINT)
               AS wow_delta_c,
           CAST(CASE WHEN LAG(revenue_c) OVER (
                    PARTITION BY grp ORDER BY week_start) IS NULL THEN 0
                ELSE (revenue_c - LAG(revenue_c) OVER (
                         PARTITION BY grp ORDER BY week_start)) * 1000000
                     // LAG(revenue_c) OVER (
                         PARTITION BY grp ORDER BY week_start)
                END AS BIGINT) AS wow_delta_ppm
    FROM weekly
    ORDER BY grp, week_start
    """,
)
def q_ts_resample_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALENDAR RESAMPLE to ISO weeks with week-over-week deltas — the
    downsample-then-diff every reporting pipeline runs: DATE_TRUNC
    ('week') buckets to Monday on BOTH engines (ISO-8601 semantics,
    verified parity across the 1998+ slice's ~190 weeks x 5 groups),
    one map-side-combinable aggregate, then a LAG window over the
    O(weeks) result — the window input scales with calendar span, not
    order volume. Delta is exact integer cents; relative change is
    truncating PPM against the prior week (0 for the first week —
    COALESCE'd so the emission is total). The 1998+ filter keeps the
    series to the fixture's densest tail and pushes down to the scan.
    Reference analog: none — target-only capability."""
    orders = load(spark, sf_dir, "orders")
    weekly = (
        orders.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select(
            F.col("o_orderpriority").alias("grp"),
            F.date_trunc("week", F.col("o_orderdate"))
            .cast("date")
            .alias("week_start"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("grp", "week_start")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("revenue_c"),
        )
    )
    w = W.partitionBy("grp").orderBy("week_start")
    prev = F.lag("revenue_c").over(w)
    return weekly.select(
        "grp",
        "week_start",
        "n_orders",
        "revenue_c",
        (F.col("revenue_c") - F.coalesce(prev, F.lit(0))).alias("wow_delta_c"),
        F.when(prev.isNull(), F.lit(0))
        .otherwise(
            F.expr(
                "(revenue_c - lag(revenue_c) OVER (PARTITION BY grp"
                " ORDER BY week_start)) * 1000000 DIV lag(revenue_c)"
                " OVER (PARTITION BY grp ORDER BY week_start)"
            )
        )
        .cast("long")
        .alias("wow_delta_ppm"),
    ).orderBy("grp", "week_start")


@register(
    "q_win_path_topk",
    oracle=f"""
    WITH ranked AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM {EVENTS_US}
    ),
    paths AS (
        SELECT user_id,
               MAX(CASE WHEN rn = 1 THEN event_type END) || '>' ||
               MAX(CASE WHEN rn = 2 THEN event_type END) || '>' ||
               MAX(CASE WHEN rn = 3 THEN event_type END) AS path
        FROM ranked WHERE rn <= 3
        GROUP BY user_id
        HAVING COUNT(*) = 3
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM paths
    GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 10
    """,
)
def q_win_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP-K USER JOURNEY PATHS — the path-mining readout behind
    onboarding analysis: the 10 most common first-three-event
    sequences. The naive formulation collects per-user event lists
    (collect_list is ORDER-NONDETERMINISTIC in a distributed groupBy —
    a correctness trap), so the path is assembled DETERMINISTICALLY:
    rank events per user (one per-user sort window, top-3 rows pruned
    by Catalyst's WindowGroupLimit before the shuffle), pivot the three
    steps with conditional MAX into one row per user, concatenate, and
    count. Users with fewer than 3 events drop via HAVING. Output is
    bounded by |event_type|^3 regardless of user count; ties in the
    top-10 are broken lexicographically for cross-engine determinism.
    Reference analog: none — target-only capability."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 3)
    paths = (
        ranked.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_steps"),
            F.concat_ws(
                ">",
                F.max(F.when(F.col("rn") == 1, F.col("event_type"))),
                F.max(F.when(F.col("rn") == 2, F.col("event_type"))),
                F.max(F.when(F.col("rn") == 3, F.col("event_type"))),
            ).alias("path"),
        )
        .filter(F.col("n_steps") == 3)
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(10)
    )


@register(
    "q_win_distinct_bitmask",
    oracle=f"""
    WITH coded AS (
        SELECT user_id, ts, event_id,
               CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                    WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                    ELSE 16 END AS bit
        FROM {EVENTS_US}
    ),
    masked AS (
        SELECT user_id, event_id,
               CAST(BIT_OR(bit) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS mask
        FROM coded
    )
    SELECT user_id, event_id, mask,
           CAST(BIT_COUNT(mask) AS BIGINT) AS distinct_types_10
    FROM masked
    ORDER BY user_id, event_id
    """,
)
def q_win_distinct_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT sliding COUNT DISTINCT via BITMASK — the small-domain
    counter a behavioral-diversity feature needs ("how many distinct
    event types in the user's last 10 events"): COUNT(DISTINCT) OVER a
    sliding frame is unsupported/expensive on both engines, and
    q_win_sketch_distinct's HLL is approximate — but a domain of 5
    event types packs into 5 BITS, turning the window into a plain
    BIT_OR + POPCOUNT: O(1) state, mergeable, exact, and at 100 TB the
    same trick covers any dictionary-encodable domain <= 64 with zero
    extra shuffle (one per-user sort, same as any sliding window).
    Emission includes the raw mask (the feature vector) and its
    popcount. Reference analog: none — target-only capability."""
    ev = load(spark, sf_dir, "events")
    coded = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "purchase", 4)
        .when(F.col("event_type") == "signup", 8)
        .otherwise(16)
        .alias("bit"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
    )
    masked = coded.select(
        "user_id",
        "event_id",
        F.expr(
            "bit_or(bit) OVER (PARTITION BY user_id ORDER BY ts, event_id"
            " ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)"
        )
        .cast("long")
        .alias("mask"),
    )
    return masked.select(
        "user_id",
        "event_id",
        "mask",
        F.bit_count("mask").cast("long").alias("distinct_types_10"),
    ).orderBy("user_id", "event_id")


@register(
    "q_win_concurrency_sweep",
    oracle=f"""
    WITH iv AS (
        SELECT event_type, event_id,
               epoch_us(ts) AS s,
               epoch_us(ts) + 600000000 AS e
        FROM {EVENTS_US}
    ),
    pts AS (
        SELECT event_type, s AS t, 1 AS delta, event_id FROM iv
        UNION ALL
        SELECT event_type, e AS t, -1 AS delta, event_id FROM iv
    ),
    run AS (
        SELECT event_type, t, delta,
               CAST(SUM(delta) OVER (
                   PARTITION BY event_type
                   ORDER BY t, delta, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS conc
        FROM pts
    )
    SELECT event_type,
           CAST(COUNT(*) // 2 AS BIGINT) AS n_events,
           CAST(MAX(conc) AS BIGINT) AS max_concurrency,
           CAST(MIN(CASE WHEN conc = (SELECT MAX(r2.conc) FROM run r2
                         WHERE r2.event_type = run.event_type)
                    THEN t END) AS BIGINT) AS first_peak_us
    FROM run
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_win_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SWEEP-LINE MAX CONCURRENCY — "how many 10-minute event windows
    overlap at the worst moment, per stream": the interval-overlap
    question behind capacity planning and session-server sizing. The
    naive interval self-join is O(n^2) per key; the sweep-line
    formulation is linear: each interval becomes a +1/-1 point, one
    per-key sort orders the 2n points (ends before starts at the same
    microsecond — delta ascending — so touching intervals do NOT
    count as concurrent), and a running sum IS the concurrency curve.
    Max + first time the peak is reached are then one aggregate.
    Everything is exact integer microseconds. At 100 TB: one shuffle
    on the stream key, 2x row fan-out, no join at all. The oracle's
    correlated-MAX subquery is the quadratic shape this plan avoids.
    Reference analog: none — target-only capability."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = ev.select(
        "event_type",
        "event_id",
        us.alias("s"),
        (us + F.lit(600_000_000)).alias("e"),
    )
    pts = iv.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("delta"), "event_id"
    ).unionAll(
        iv.select(
            "event_type",
            F.col("e").alias("t"),
            F.lit(-1).alias("delta"),
            "event_id",
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    run = pts.select(
        "event_type", "t", "delta", F.sum("delta").over(w).alias("conc")
    )
    peak = run.groupBy("event_type").agg(F.max("conc").alias("maxc"))
    return (
        run.join(F.broadcast(peak), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr("count(*) DIV 2").alias("n_events"),
            F.max("conc").alias("max_concurrency"),
            F.min(
                F.when(F.col("conc") == F.col("maxc"), F.col("t"))
            ).alias("first_peak_us"),
        )
        .orderBy("event_type")
    )


@register(
    "q_ts_new_users",
    oracle=f"""
    WITH first_seen AS (
        SELECT user_id,
               MIN(CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT))
                   AS d
        FROM {EVENTS_US} GROUP BY user_id
    ),
    daily AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS new_users
        FROM first_seen GROUP BY d
    )
    SELECT d, new_users,
           CAST(SUM(new_users) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cumulative_users
    FROM daily
    ORDER BY d
    """,
)
def q_ts_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW-USER GROWTH CURVE — first-seen day per user, daily
    acquisition counts, and the cumulative registration curve: the
    growth chart every product pipeline materializes. First-seen is one
    hash aggregate over users (NOT a window over raw events — min(day)
    per user is map-side combinable and never sorts the event log);
    the cumulative sum then runs over the O(days) daily table, so the
    only data-sized shuffle is the user aggregate. The single-partition
    cumulative window is safe because its input is calendar-bounded
    (~tens of rows per year), never data-bounded. All integers.
    Reference analog: none — target-only capability."""
    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        )
        .cast("long")
        .alias("d")
    )
    daily = first_seen.groupBy("d").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        "d",
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    ).orderBy("d")


@register(
    "q_win_rsi",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1998-01-01' AS BIGINT)
                   AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS v
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        GROUP BY 1
    ),
    chg AS (
        SELECT d, v,
               v - LAG(v) OVER (ORDER BY d) AS delta,
               ROW_NUMBER() OVER (ORDER BY d) AS rn
        FROM daily
    ),
    gl AS (
        SELECT d, rn,
               CAST(SUM(CASE WHEN delta > 0 THEN delta ELSE 0 END)
                    OVER (ORDER BY d ROWS BETWEEN 13 PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS gains,
               CAST(SUM(CASE WHEN delta < 0 THEN -delta ELSE 0 END)
                    OVER (ORDER BY d ROWS BETWEEN 13 PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS losses
        FROM chg
    )
    SELECT d, gains, losses,
           CAST(CASE WHEN gains + losses = 0 THEN 500000
                ELSE 1000000 * gains // (gains + losses) END AS BIGINT)
               AS rsi_ppm
    FROM gl
    WHERE rn >= 15
    ORDER BY d
    """,
)
def q_win_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSI MOMENTUM INDICATOR (14-day simple-average variant — Cutler's
    RSI) over the 1998+ daily revenue series: rolling sums of up-moves
    and down-moves, RSI = gains/(gains+losses). Wilder's classic
    exponential smoothing is a float recurrence with no
    order-free form (not hash-portable); Cutler's SMA variant is the
    documented exact alternative — every quantity here is an integer
    cent sum over a 14-row frame, and the indicator is one truncating
    ppm division (degenerate flat window pinned to 500000 = RSI 50).
    Scored only once the full lookback exists (rn >= 15). One daily
    aggregate + one ordered window over the O(days) series. Reference
    analog: none — target-only capability."""
    orders = load(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
        )
        .groupBy(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1998-01-01").cast("date")
            )
            .cast("long")
            .alias("d")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("v")
        )
    )
    w_ord = W.orderBy("d")
    chg = daily.select(
        "d",
        (F.col("v") - F.lag("v").over(w_ord)).alias("delta"),
        F.row_number().over(w_ord).alias("rn"),
    )
    w14 = W.orderBy("d").rowsBetween(-13, 0)
    gl = chg.select(
        "d",
        "rn",
        F.sum(
            F.when(F.col("delta") > 0, F.col("delta")).otherwise(0)
        ).over(w14).alias("gains"),
        F.sum(
            F.when(F.col("delta") < 0, -F.col("delta")).otherwise(0)
        ).over(w14).alias("losses"),
    )
    return (
        gl.filter(F.col("rn") >= 15)
        .select(
            "d",
            "gains",
            "losses",
            F.when(F.col("gains") + F.col("losses") == 0, F.lit(500000))
            .otherwise(F.expr("1000000 * gains DIV (gains + losses)"))
            .cast("long")
            .alias("rsi_ppm"),
        )
        .orderBy("d")
    )


@register(
    "q_ts_wau",
    oracle=f"""
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d
        FROM {EVENTS_US}
    ),
    span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM ud),
    contrib AS (
        SELECT user_id, UNNEST(GENERATE_SERIES(d, d + 6)) AS t FROM ud
    )
    SELECT c.t AS d,
           CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS wau,
           (c.t >= s.d0 + 6 AND c.t <= s.d1) AS full_window
    FROM contrib c CROSS JOIN span s
    WHERE c.t <= s.d1
    GROUP BY c.t, s.d0, s.d1
    ORDER BY d
    """,
)
def q_ts_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING 7-DAY ACTIVE USERS (WAU) — the engagement curve product
    analytics reports daily, and the textbook case where naive
    COUNT(DISTINCT) OVER a RANGE frame simply does not exist in SQL
    engines. The scalable exact formulation: dedupe to (user, day)
    pairs FIRST (the only data-sized aggregate), then each pair
    scatters to the 7 report days it supports (a constant 7x fan-out of
    the already-reduced pair table — the q_geo_grid_density scatter
    idiom on the time axis) and one distinct-count per report day
    finishes it. Partial leading windows are flagged rather than
    dropped (full_window=false until 7 days of history exist).
    Reference analog: none — target-only capability."""
    ev = load(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).distinct()
    span = ud.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence("d", F.col("d") + 6)).alias("t"),
    )
    return (
        contrib.crossJoin(F.broadcast(span))
        .filter(F.col("t") <= F.col("d1"))
        .groupBy("t", "d0", "d1")
        .agg(F.countDistinct("user_id").alias("wau"))
        .select(
            F.col("t").alias("d"),
            "wau",
            (
                (F.col("t") >= F.col("d0") + 6)
                & (F.col("t") <= F.col("d1"))
            ).alias("full_window"),
        )
        .orderBy("d")
    )


@register(
    "q_fraud_double_charge",
    oracle="""
    WITH seq AS (
        SELECT o_custkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) // 1000000
                   AS amount_band,
               CAST(o_orderdate AS DATE) AS d,
               o_orderkey,
               LAG(CAST(o_orderdate AS DATE)) OVER w AS prev_d,
               LAG(o_orderkey) OVER w AS prev_key
        FROM orders
        WINDOW w AS (
            PARTITION BY o_custkey,
                CAST(ROUND(o_totalprice * 100) AS BIGINT) // 1000000
            ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
    )
    SELECT o_custkey, amount_band,
           CAST(prev_key AS BIGINT) AS first_orderkey,
           CAST(o_orderkey AS BIGINT) AS second_orderkey,
           CAST(d - prev_d AS BIGINT) AS gap_days
    FROM seq
    WHERE prev_d IS NOT NULL AND d - prev_d <= 3
    ORDER BY o_custkey, amount_band, second_orderkey
    """,
)
def q_fraud_double_charge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAPID-REPEAT CHARGE DETECTION — same customer, similar amount
    (the same $10k band on this fixture's price range; production tunes
    the band to the amount distribution — exact-cent matching measured
    VACUOUS on random TPC-H prices), within 3 days: the
    duplicate-transaction screen every payments pipeline runs. The
    naive shape is a band self-join on (customer, amount-band,
    |date diff| <= 3) — quadratic inside hot cells; the linear
    formulation sorts each (customer, band) partition once and flags
    ADJACENT pairs via LAG (a chain of k same-band charges emits k-1
    review pairs, not C(k,2)). Exact integer bands and day gaps;
    deterministic orderkey tiebreaks. One window over one shuffle.
    Reference analog: none — target-only capability."""
    orders = load(spark, sf_dir, "orders")
    seq = orders.select(
        "o_custkey",
        F.expr(
            "CAST(ROUND(o_totalprice * 100) AS BIGINT) DIV 1000000"
        ).alias("amount_band"),
        F.to_date("o_orderdate").alias("d"),
        "o_orderkey",
    )
    w = W.partitionBy("o_custkey", "amount_band").orderBy("d", "o_orderkey")
    flagged = seq.select(
        "o_custkey",
        "amount_band",
        "d",
        "o_orderkey",
        F.lag("d").over(w).alias("prev_d"),
        F.lag("o_orderkey").over(w).alias("prev_key"),
    ).filter(
        F.col("prev_d").isNotNull()
        & (F.datediff("d", "prev_d") <= 3)
    )
    return flagged.select(
        "o_custkey",
        "amount_band",
        F.col("prev_key").alias("first_orderkey"),
        F.col("o_orderkey").alias("second_orderkey"),
        F.datediff("d", "prev_d").cast("long").alias("gap_days"),
    ).orderBy("o_custkey", "amount_band", "second_orderkey")


@register(
    "q_win_rolling_corr",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
               CAST(SUM(CASE WHEN event_type = 'click'
                    THEN CAST(ROUND(value * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(ROUND(value * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS y
        FROM {EVENTS_US}
        GROUP BY 1
    ),
    roll AS (
        SELECT d,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(x) OVER w AS BIGINT) AS sx,
               CAST(SUM(y) OVER w AS BIGINT) AS sy,
               CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
               CAST(SUM(y * y) OVER w AS BIGINT) AS syy,
               CAST(SUM(x * y) OVER w AS BIGINT) AS sxy,
               ROW_NUMBER() OVER (ORDER BY d) AS rn
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT d, n,
           CAST(ROUND(1000000.0 * (
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           ), 0) AS BIGINT) AS corr_micro
    FROM roll
    WHERE rn >= 14
    ORDER BY d
    """,
)
def q_win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING 14-DAY CORRELATION between the click and purchase
    revenue series — the co-movement monitor behind "are conversions
    tracking engagement this week?" alerts. The portability trap is
    that rolling VARIANCE/CORR functions accumulate floats in
    engine-specific (segment-tree) orders; here every windowed quantity
    is an EXACT INT64 rolling sum (counts/cents and their products over
    a 14-row frame — integer window sums are order-free), and the
    Pearson ratio is one per-row IEEE expression over those exact
    scalars, micro-rounded (the q_graph_assortativity idiom, per row).
    Emitted only once the full lookback exists. One daily aggregate +
    one ordered window over the O(days) series. Reference analog:
    none — target-only capability."""
    ev = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("d")
    ).agg(
        F.sum(
            F.when(F.col("event_type") == "click", cents).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(F.col("event_type") == "purchase", cents).otherwise(0)
        ).alias("y"),
    )
    w = W.orderBy("d").rowsBetween(-13, 0)
    roll = daily.select(
        "d",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.row_number().over(W.orderBy("d")).alias("rn"),
    )

    def dd(c: str):
        return F.col(c).cast("double")

    corr = (dd("n") * dd("sxy") - dd("sx") * dd("sy")) / (
        F.sqrt(dd("n") * dd("sxx") - dd("sx") * dd("sx"))
        * F.sqrt(dd("n") * dd("syy") - dd("sy") * dd("sy"))
    )
    return (
        roll.filter(F.col("rn") >= 14)
        .select(
            "d",
            "n",
            F.round(F.lit(1000000.0) * corr, 0).cast("long").alias(
                "corr_micro"
            ),
        )
        .orderBy("d")
    )


@register(
    "q_ts_dau_mau",
    oracle=f"""
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d
        FROM {EVENTS_US}
    ),
    span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM ud),
    dau AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY d
    ),
    mau_c AS (
        SELECT user_id, UNNEST(GENERATE_SERIES(d, d + 27)) AS t FROM ud
    ),
    mau AS (
        SELECT t AS d, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
        FROM mau_c GROUP BY t
    )
    SELECT dau.d, dau.dau, mau.mau,
           CAST(1000000 * dau.dau // mau.mau AS BIGINT) AS stickiness_ppm
    FROM dau JOIN mau ON dau.d = mau.d CROSS JOIN span s
    WHERE dau.d >= s.d0 + 27 AND dau.d <= s.d1
    ORDER BY dau.d
    """,
)
def q_ts_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU STICKINESS — the engagement-quality ratio (what fraction
    of the monthly audience shows up on a given day), reported only for
    days with a FULL 28-day trailing window (a partial MAU inflates
    stickiness — the classic dashboard bug). Same scatter idiom as
    q_ts_wau with a 28-day support fan-out of the deduped (user, day)
    pairs; DAU is the plain per-day distinct count; the ratio is
    truncating ppm of two exact counts. Thin emission on the ~30-day
    fixture (the last few days) by design — the windows are the point.
    Reference analog: none — target-only capability."""
    ev = load(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).distinct().localCheckpoint()
    span = ud.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    mau = (
        ud.select("user_id", F.explode(F.sequence("d", F.col("d") + 27)).alias("t"))
        .groupBy(F.col("t").alias("d"))
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return (
        dau.join(mau, "d")
        .crossJoin(F.broadcast(span))
        .filter((F.col("d") >= F.col("d0") + 27) & (F.col("d") <= F.col("d1")))
        .select(
            "d",
            "dau",
            "mau",
            F.expr("1000000 * dau DIV mau").alias("stickiness_ppm"),
        )
        .orderBy("d")
    )
