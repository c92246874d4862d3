"""Join operators — every type and physical strategy (SURVEY §2.3 "Joins").

Reference analogs: the connector's DirectJoin (point-lookup join, SURVEY
§2.2 B5) maps to broadcast hash join; `repartitionByCassandraReplica`
(B6) maps to key-co-partitioned joins; token-aware locality (B2) maps to
aligned partitioning so the join's exchange is shared/reusable.

Scale notes (100 TB): fact↔dim joins broadcast the dim (no shuffle of
the fact side at all); fact↔fact joins shuffle both sides on the join
key once — AQE converts to broadcast at runtime when a filtered side
shrinks below the threshold, and splits skewed partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..catalog import load
from ..conf import co_partition
from ..registry import EVENTS_US, register


@register(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, c.c_name, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join (SMJ/SHJ; AQE may convert to broadcast)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_orderdate", "c_name", "c_mktsegment", "o_totalprice"
    )


@register(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 150000
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a join-side predicate (kept in the ON clause,
    not the WHERE, so unmatched rows survive)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 150000), "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "q_join_right",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "o_custkey", "c_name"
    )


@register(
    "q_join_full",
    oracle="""
    WITH big_cust AS (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000),
         big_ord  AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
                      WHERE o_totalprice > 300000)
    SELECT b.c_custkey, b.c_name, g.o_orderkey, g.o_totalprice
    FROM big_cust b FULL JOIN big_ord g ON b.c_custkey = g.o_custkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join on filtered sides so both null-extensions occur."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select(
        "c_custkey", "c_name"
    )
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "outer").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 250000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one big order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_broadcast",
    oracle="""
    SELECT n.n_name, r.r_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join — the engine's analog of the connector's
    DirectJoin (SURVEY §2.2 B5): the dim is shipped to every executor so
    the fact side is never shuffled. Explicit `broadcast()` hints; the
    plan-shape test asserts BroadcastHashJoin with no fact-side Exchange.
    """
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


@register(
    "q_join_theta_range",
    oracle="""
    WITH bands(band_name, lo, hi) AS (
        VALUES ('low', 0.0, 100000.0), ('mid', 100000.0, 300000.0),
               ('high', 300000.0, 1000000.0)
    )
    SELECT b.band_name, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS band_value
    FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band_name
    """,
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/theta) join against a tiny band table. Physically a
    BroadcastNestedLoopJoin — fine because the build side is 3 rows; at
    scale, range joins against small band tables stay broadcast-NL, which
    is linear in the fact side."""
    o = load(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 100000.0), ("mid", 100000.0, 300000.0), ("high", 300000.0, 1000000.0)],
        "band_name string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("band_value"),
        )
    )


@register(
    "q_join_cross",
    oracle="""
    SELECT s.s_suppkey, r.r_regionkey, s.s_name, r.r_name
    FROM supplier s CROSS JOIN region r
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (kept to supplier × region, both tiny)."""
    s = load(spark, sf_dir, "supplier")
    r = load(spark, sf_dir, "region")
    return s.crossJoin(r).select("s_suppkey", "r_regionkey", "s_name", "r_name")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Generic as-of join: for every left row, attach the right row with
    the greatest ``right_ts`` ≤ ``left_ts`` within the same ``key``.

    Spark has no ASOF JOIN; the scalable formulation is the union-marker
    trick — interleave both streams ordered by (key, ts) and carry the
    latest right payload forward with a running `last(ignorenulls=True)`
    window. One shuffle on the key, no range explosion, no row-count
    blowup — this survives 100 TB where a naive range join would not.

    ``payload_cols`` are the right-side columns carried to the output
    (suffixed nothing — caller aliases). All left columns are preserved.
    """
    lcols = [c for c in left.columns]
    tagged = left.select(
        key,
        F.col(left_ts).alias("_ord_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols if c != key],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload_cols],
    ).unionByName(
        right.select(
            key,
            F.col(right_ts).alias("_ord_ts"),
            F.lit(0).alias("_is_left"),
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in lcols
                if c != key
            ],
            *[F.col(c) for c in payload_cols],
        )
    )
    # Right rows sort before left rows at the same timestamp (_is_left
    # asc) so the `right_ts <= left_ts` inclusive semantics hold.
    w = (
        W.partitionBy(key)
        .orderBy(F.col("_ord_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = tagged.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("_is_left") == 1).select(
        *lcols, *[F.col(f"_asof_{c}").alias(c) for c in payload_cols]
    )


@register(
    "q_join_asof_tolerance",
    oracle=f"""
    SELECT c.event_id, c.user_id, c.ts,
           p.ts IS NOT NULL AND p.ts >= c.ts - INTERVAL 6 HOUR AS matched,
           CASE WHEN p.ts >= c.ts - INTERVAL 6 HOUR THEN p.value END
               AS fresh_value,
           CASE WHEN p.ts >= c.ts - INTERVAL 6 HOUR
                THEN epoch_us(c.ts) - epoch_us(p.ts) END AS staleness_us
    FROM (SELECT event_id, user_id, ts FROM {EVENTS_US}
          WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM {EVENTS_US}
                    WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance — the feature-store lookup
    contract: a click only uses the user's most recent purchase if it
    is at most 6 hours old; older matches are rejected (matched=false,
    NULL payload) exactly like a feature-TTL miss, and the emitted
    staleness is the EXACT integer microsecond gap (unix_micros /
    epoch_us on the µs-truncated staging copy — no interval-unit
    boundary-counting semantics to diverge between engines).

    Same union-marker single-shuffle plan as q_join_asof (the tolerance
    is a post-filter expression on the carried payload, free at any
    scale); DuckDB's native ASOF LEFT JOIN + CASE is the oracle."""
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    j = asof_join(
        clicks, purchases, "user_id", "ts", "p_ts", ["p_ts", "p_value"]
    )
    fresh = F.col("p_ts").isNotNull() & (
        F.col("p_ts") >= F.col("ts") - F.expr("INTERVAL 6 HOURS")
    )
    return j.select(
        "event_id",
        "user_id",
        "ts",
        fresh.alias("matched"),
        F.when(fresh, F.col("p_value")).alias("fresh_value"),
        # unix_micros requires tz-aware input; the ntz→timestamp cast is
        # value-exact because the registry wrapper pins the session to
        # UTC, matching DuckDB's epoch_us on the same ntz values
        F.when(
            fresh,
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("p_ts").cast("timestamp")),
        ).alias("staleness_us"),
    )


@register(
    "q_join_asof",
    oracle=f"""
    SELECT e.event_id, e.user_id, e.ts,
           p.ts AS last_purchase_ts, p.value AS last_purchase_value
    FROM {EVENTS_US} e
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM {EVENTS_US}
                    WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    WHERE e.event_type = 'click'
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click event matched to the same user's most recent
    purchase at-or-before its timestamp (via the generic `asof_join`;
    DuckDB's native ASOF JOIN is the oracle)."""
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    return asof_join(
        clicks, purchases, "user_id", "ts", "p_ts", ["p_ts", "p_value"]
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.col("p_ts").alias("last_purchase_ts"),
        F.col("p_value").alias("last_purchase_value"),
    )


@register(
    "q_join_copartitioned",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, l.l_linenumber, l.l_extendedprice
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_quantity > 45
    """,
)
def q_join_copartitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-co-partitioned fact↔fact join — the analog of the connector's
    `repartitionByCassandraReplica` + token-aligned locality (SURVEY §2.2
    B2/B6): both sides are explicitly hash-partitioned on the join key so
    the join itself introduces no further exchange, and the partitioning
    is reusable by any later stage keyed on o_orderkey."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    o2, l2 = co_partition(
        o, l.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    )
    return o2.join(l2, "o_orderkey").select(
        "o_orderkey", "o_orderdate", "l_linenumber", "l_extendedprice"
    )


@register(
    "q_join_multiway",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped 3-table star join: filtered dim broadcast into the
    orders↔lineitem shuffle join, grouped revenue on top."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@register(
    "q_join_salted",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated (salted) equi join, result-identical to the plain
    join: the probe side's key is salted into S sub-keys with a keyed
    hash, the build side is replicated S times, and the join runs on
    (key, salt) — a hot key's rows now land on S partitions instead of
    one. This is the manual fallback for skew AQE can't fix (a single
    key larger than one executor's memory); at 100 TB, S is sized to
    hottest-key-rows / target-partition-rows. Replication costs S× the
    build side, so it is only applied to the skewed keys in practice —
    here the whole (small) side is replicated for clarity."""
    S = 8
    o = load(spark, sf_dir, "orders").withColumn(
        "_salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(S)).cast("int")
    )
    c = load(spark, sf_dir, "customer").withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(S)]))
    )
    dec = lambda col: col.cast("decimal(18,4)")  # noqa: E731
    return (
        o.join(c, (o.o_custkey == c.c_custkey) & (o["_salt"] == c["_salt"]))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec(F.col("o_totalprice"))).cast("double").alias("total_price"),
        )
    )


@register(
    "q_join_range_binned",
    oracle=f"""
    WITH e AS (SELECT event_id, ts FROM {EVENTS_US} ev),
         w AS (SELECT event_id AS win_id, ts AS win_start,
                      ts + INTERVAL 30 MINUTE AS win_end
               FROM {EVENTS_US} ev WHERE event_type = 'purchase')
    SELECT w.win_id, COUNT(*) AS n_events
    FROM w JOIN e ON e.ts >= w.win_start AND e.ts < w.win_end
    GROUP BY w.win_id
    """,
)
def q_join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key) made scalable by binning: every
    30-minute interval explodes to the 30-minute bins it overlaps, each
    event maps to its bin, and the engine runs an EQUI join on the bin
    followed by the exact range predicate. A naive theta join is a
    broadcast-nested-loop (O(N·M) compares, one side fully replicated);
    the bin key turns it into a hash join whose fan-out is bounded by
    interval-length / bin-width + 1 ≈ 2 rows per interval — the same
    trick behind interval-join implementations in stream processors.
    DuckDB's native IEJoin on the un-binned predicate is the oracle."""
    ev = load(spark, sf_dir, "events")
    bin_len = 1800  # seconds; == interval length so each window spans ≤ 2 bins
    e = ev.select(
        "event_id", "ts", (F.unix_timestamp("ts") / bin_len).cast("long").alias("bin")
    )
    w = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("win_id"),
            F.col("ts").alias("win_start"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("win_end"),
        )
        .withColumn(
            "bin",
            F.explode(
                F.sequence(
                    (F.unix_timestamp("win_start") / bin_len).cast("long"),
                    (F.unix_timestamp("win_end") / bin_len).cast("long"),
                )
            ),
        )
    )
    return (
        w.join(
            e,
            (w.bin == e.bin)
            & (e.ts >= F.col("win_start"))
            & (e.ts < F.col("win_end")),
        )
        .groupBy("win_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "q_join_pit",
    oracle=f"""
    WITH v AS (
        SELECT user_id, ts AS valid_from, value AS attr_value,
               CAST(ROW_NUMBER() OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                    AS BIGINT) AS dim_version
        FROM {EVENTS_US} WHERE event_type IN ('signup', 'purchase')
    ),
    vd AS (
        SELECT user_id, valid_from, attr_value, dim_version FROM (
            SELECT v.*, ROW_NUMBER() OVER
                   (PARTITION BY user_id, valid_from
                    ORDER BY dim_version DESC) AS rn
            FROM v
        ) WHERE rn = 1
    ),
    f AS (
        SELECT event_id, user_id, ts, event_type FROM {EVENTS_US}
        WHERE event_type IN ('click', 'view', 'error')
    )
    SELECT f.event_id, f.user_id, f.ts, f.event_type,
           vd.dim_version, vd.attr_value
    FROM f ASOF LEFT JOIN vd
      ON f.user_id = vd.user_id AND f.ts >= vd.valid_from
    """,
)
def q_join_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (feature-store) join: every fact event is enriched
    with the dimension version that was valid AT its timestamp — the
    lookup that prevents feature leakage when building training rows
    from an SCD2 dimension (q_scd2_dimension builds the versions; this
    consumes them). Versions sharing a valid_from are collapsed to the
    latest first, making the lookup deterministic. Runs on the generic
    union-marker asof_join: one shuffle on user_id, no range-join row
    explosion — at 100 TB the fact stream never fans out. Oracle is
    DuckDB's native ASOF LEFT JOIN over the identical version set."""
    e = load(spark, sf_dir, "events")
    wv = W.partitionBy("user_id").orderBy("ts", "event_id")
    v = (
        e.filter(F.col("event_type").isin("signup", "purchase"))
        .select(
            "user_id",
            F.col("ts").alias("valid_from"),
            F.col("value").alias("attr_value"),
            F.row_number().over(wv).cast("long").alias("dim_version"),
        )
    )
    wd = W.partitionBy("user_id", "valid_from").orderBy(
        F.col("dim_version").desc()
    )
    vd = (
        v.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    f = e.filter(F.col("event_type").isin("click", "view", "error")).select(
        "event_id", "user_id", "ts", "event_type"
    )
    return asof_join(
        f, vd, key="user_id", left_ts="ts", right_ts="valid_from",
        payload_cols=["dim_version", "attr_value"],
    )


@register(
    "q_join_null_safe",
    oracle="""
    WITH e AS (
        SELECT event_id,
               CASE WHEN user_id % 10 = 0 THEN NULL ELSE user_id END AS uid,
               event_type
        FROM events
    ),
    c AS (
        SELECT CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_custkey END AS uid,
               c_mktsegment
        FROM customer
    )
    SELECT e.event_type, c.c_mktsegment, COUNT(*) AS n
    FROM e JOIN c ON e.uid IS NOT DISTINCT FROM c.uid
    GROUP BY e.event_type, c.c_mktsegment
    ORDER BY e.event_type, c.c_mktsegment
    """,
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of silently dropping — the semantics an
    entity-matching join needs when "unknown" is itself a join class
    (every 10th key is nulled here to create that class). Crucially
    Spark still plans `<=>` as a HASH join key (null-safe equality is
    an equi predicate), not a nested loop — the same single shuffle as
    `=` — while `a = b OR (a IS NULL AND b IS NULL)` written by hand
    would fall off the equi-join path entirely.

    100 TB posture — partial-aggregation pushdown through the join
    (r12): the NULL class is ONE hash key, so the naive
    join-then-count plan materializes a |nulls_L|x|nulls_R| cross
    block through a single reducer — quadratic when both sides scale.
    The r11 docstring called that cost "the query's semantics"; the
    second-decade probe (sf0.1 -> sf1, tools/scaling_second_decade.py)
    showed it is NOT: the naive plan went superlinear (minutes per run
    at sf1, vs 0.9 s at sf0.1), while COUNT over a join of
    multiplicities is distributive — pre-aggregate each side to one
    row per (key, group-col) carrying its count, null-safe-join the
    DISTINCT key tables, and SUM the count products. The join inputs
    collapse from |rows| to |distinct keys x group values| (the null
    class becomes 5x5 rows instead of |nulls_L|x|nulls_R|), the skew
    key carries one row per group value, and the result is
    row-identical (same oracle). This is the classic groupjoin /
    eager-aggregation transformation (Yannakakis-style), applied by
    hand because Catalyst does not push partial aggregates below
    joins. Second decade after the rewrite: linear-with-overhead (see
    SCALING.md r12).
    """
    e = (
        load(spark, sf_dir, "events")
        .select(
            F.when(F.col("user_id") % 10 == 0, None)
            .otherwise(F.col("user_id"))
            .alias("uid"),
            "event_type",
        )
        .groupBy("uid", "event_type")
        .agg(F.count(F.lit(1)).alias("ne"))
    )
    c = (
        load(spark, sf_dir, "customer")
        .select(
            F.when(F.col("c_custkey") % 10 == 0, None)
            .otherwise(F.col("c_custkey"))
            .alias("uid"),
            "c_mktsegment",
        )
        .groupBy("uid", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    return (
        e.join(c, e["uid"].eqNullSafe(c["uid"]))
        .groupBy("event_type", "c_mktsegment")
        .agg(F.sum(F.col("ne") * F.col("nc")).alias("n"))
        .orderBy("event_type", "c_mktsegment")
    )


@register(
    "q_join_bloom",
    oracle="""
    SELECT l.l_returnflag,
           CAST(YEAR(o.o_orderdate) AS INTEGER) AS order_year,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
               AS urgent_revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag, CAST(YEAR(o.o_orderdate) AS INTEGER)
    ORDER BY l.l_returnflag, order_year
    """,
)
def q_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective-dim fact join shaped for Spark's RUNTIME BLOOM FILTER
    (semi-join reduction): the filtered orders side is small after the
    `o_orderpriority = '1-URGENT'` predicate, so Catalyst's
    InjectRuntimeFilter rule can build a bloom filter from the build
    side's join keys DURING execution and push
    `might_contain(xxhash64(l_orderkey))` into the lineitem SCAN —
    ~80% of fact rows die before the shuffle, the distributed analog
    of an index lookaside. The query itself is declared as a plain
    join + aggregate: NO hints, because the injection thresholds
    (`spark.sql.optimizer.runtime.bloomFilter.*`, on by default in
    Spark 3.4+) exist precisely so the rewrite fires only when the
    fact scan is big enough to pay for the filter (10 GB default —
    i.e., at the 100 TB deployment, not the sf0.01 fixture, where the
    dim simply broadcasts). tests/test_plans.py drops the thresholds
    to force the rewrite and asserts the `might_contain` predicate
    lands on the lineitem scan filter, so the shape is locked in even
    though small fixtures never trigger it naturally.

    Scale: one fact shuffle AFTER bloom reduction; the aggregate
    reuses the decimal exact-sum discipline. Bloom false positives
    only cost wasted shuffle rows — join correctness is unaffected,
    which is why the filter can be probabilistic.
    """
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            "l_returnflag",
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("urgent_revenue"),
        )
        .orderBy("l_returnflag", "order_year")
    )


@register(
    "q_join_asof_nearest",
    oracle=f"""
    WITH c AS (SELECT event_id, user_id, ts FROM {EVENTS_US}
               WHERE event_type = 'click'),
    p AS (SELECT user_id, ts, value FROM {EVENTS_US}
          WHERE event_type = 'purchase'),
    back AS (
        SELECT c.event_id, p.ts AS b_ts, p.value AS b_value
        FROM c ASOF LEFT JOIN p
          ON c.user_id = p.user_id AND c.ts >= p.ts
    ),
    fwd AS (
        SELECT c.event_id, p.ts AS f_ts, p.value AS f_value
        FROM c ASOF LEFT JOIN p
          ON c.user_id = p.user_id AND c.ts <= p.ts
    )
    SELECT c.event_id, c.user_id, c.ts,
           CASE
             WHEN b.b_ts IS NULL AND f.f_ts IS NULL THEN 'none'
             WHEN f.f_ts IS NULL THEN 'back'
             WHEN b.b_ts IS NULL THEN 'fwd'
             WHEN epoch_us(c.ts) - epoch_us(b.b_ts)
                  <= epoch_us(f.f_ts) - epoch_us(c.ts) THEN 'back'
             ELSE 'fwd'
           END AS matched_dir,
           CASE
             WHEN b.b_ts IS NOT NULL AND (f.f_ts IS NULL
                  OR epoch_us(c.ts) - epoch_us(b.b_ts)
                     <= epoch_us(f.f_ts) - epoch_us(c.ts)) THEN b.b_value
             ELSE f.f_value
           END AS nearest_value,
           CASE
             WHEN b.b_ts IS NOT NULL AND (f.f_ts IS NULL
                  OR epoch_us(c.ts) - epoch_us(b.b_ts)
                     <= epoch_us(f.f_ts) - epoch_us(c.ts))
               THEN epoch_us(c.ts) - epoch_us(b.b_ts)
             WHEN f.f_ts IS NOT NULL
               THEN epoch_us(f.f_ts) - epoch_us(c.ts)
           END AS gap_us
    FROM c
    LEFT JOIN back b ON c.event_id = b.event_id
    LEFT JOIN fwd f ON c.event_id = f.event_id
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-MATCH AS-OF JOIN — each click pairs with the user's
    temporally CLOSEST purchase in EITHER direction (ties prefer the
    past match: causally usable). pandas merge_asof(direction=
    'nearest') semantics, which neither Spark nor plain ASOF gives.
    Built on the same union-marker single-shuffle plan as q_join_asof:
    one interleave sorted by (ts, side), then BOTH a
    backward-carrying last(ignorenulls) over the preceding frame AND a
    forward-looking first(ignorenulls) over the following frame — two
    frames over ONE partition sort, so Catalyst plans one exchange +
    one sort, no range blow-up at any scale. An equal-timestamp
    purchase is captured by the backward frame (side ordering puts
    right rows first) with gap 0, which the tie rule then selects — so
    inclusive-both-directions semantics hold without a second sort
    order. Gap is the exact integer microsecond distance. Oracle:
    DuckDB backward + forward native ASOF joins combined with the same
    tie rule. Reference analog: none — target-only capability."""
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    tagged = clicks.select(
        "user_id",
        F.col("ts").alias("_ord_ts"),
        F.lit(1).alias("_is_left"),
        "event_id",
        "ts",
        F.lit(None).cast("timestamp_ntz").alias("p_ts"),
        F.lit(None).cast("double").alias("p_value"),
    ).unionByName(
        purchases.select(
            "user_id",
            F.col("p_ts").alias("_ord_ts"),
            F.lit(0).alias("_is_left"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("timestamp_ntz").alias("ts"),
            "p_ts",
            "p_value",
        )
    )
    order = [F.col("_ord_ts").asc(), F.col("_is_left").asc()]
    w_back = (
        W.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = tagged.select(
        "*",
        F.last("p_ts", ignorenulls=True).over(w_back).alias("b_ts"),
        F.last("p_value", ignorenulls=True).over(w_back).alias("b_value"),
        F.first("p_ts", ignorenulls=True).over(w_fwd).alias("f_ts"),
        F.first("p_value", ignorenulls=True).over(w_fwd).alias("f_value"),
    ).filter(F.col("_is_left") == 1)
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    b_gap = ts_us - F.unix_micros(F.col("b_ts").cast("timestamp"))
    f_gap = F.unix_micros(F.col("f_ts").cast("timestamp")) - ts_us
    back_wins = F.col("b_ts").isNotNull() & (
        F.col("f_ts").isNull() | (b_gap <= f_gap)
    )
    return carried.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("b_ts").isNull() & F.col("f_ts").isNull(), "none")
        .when(F.col("f_ts").isNull(), "back")
        .when(F.col("b_ts").isNull(), "fwd")
        .when(b_gap <= f_gap, "back")
        .otherwise("fwd")
        .alias("matched_dir"),
        F.when(back_wins, F.col("b_value"))
        .otherwise(F.col("f_value"))
        .alias("nearest_value"),
        F.when(back_wins, b_gap)
        .when(F.col("f_ts").isNotNull(), f_gap)
        .alias("gap_us"),
    )


@register(
    "q_join_size_estimate",
    oracle=f"""
    WITH kc AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM {EVENTS_US} GROUP BY user_id
    ),
    quart AS (
        SELECT cnt * cnt AS pairs,
               CAST(NTILE(4) OVER (ORDER BY cnt, user_id) AS BIGINT)
                   AS cnt_quartile
        FROM kc
    ),
    grouped AS (
        SELECT cnt_quartile, CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(pairs) AS BIGINT) AS est_rows
        FROM quart GROUP BY cnt_quartile
    ),
    actual AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS actual_rows
        FROM {EVENTS_US} a JOIN {EVENTS_US} b ON a.user_id = b.user_id
    )
    SELECT g.cnt_quartile, g.n_keys, g.est_rows, a.actual_rows
    FROM grouped g CROSS JOIN actual a
    ORDER BY g.cnt_quartile
    """,
)
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-CARDINALITY PRE-FLIGHT — compute the EXACT output size of an
    equi-join from the key histograms BEFORE running it: |A ⋈ B| =
    SUM_k cnt_A(k) * cnt_B(k), here for the events self-join on
    user_id. This is the guard a pipeline runs before an expensive join
    to catch quadratic hot keys (the estimate costs one hash aggregate;
    the join it predicts can cost hours at 100 TB) — and because the
    formula is exact for equi-joins, the op ALSO runs the join and
    emits actual_rows to prove estimate == actual (asserted in tests).
    Output: per count-quartile of keys, how many join rows those keys
    contribute — the skew readout ("the top quartile of users produces
    X% of the join"). Reference analog: none — target-only
    capability."""
    ev = load(spark, sf_dir, "events").select("user_id")
    kc = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    contrib = kc.select(
        "user_id", "cnt", (F.col("cnt") * F.col("cnt")).alias("pairs")
    )
    actual = (
        ev.alias("a")
        .join(ev.alias("b"), "user_id")
        .agg(F.count(F.lit(1)).alias("actual_rows"))
    )
    q = F.ntile(4).over(W.orderBy("cnt", "user_id"))
    quart = contrib.select("pairs", q.cast("long").alias("cnt_quartile"))
    return (
        quart.groupBy("cnt_quartile")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("pairs").alias("est_rows"),
        )
        .crossJoin(F.broadcast(actual))
        .orderBy("cnt_quartile")
    )
