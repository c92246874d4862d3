"""TPC-H suite over the driver fixtures (SURVEY §6: the fixtures are
"TPC-H-ish", so the industry-standard query set is the natural
completeness statement for the relational engine — every query the
fixture schema supports, end-to-end, oracle-checked).

The fixture schema is a REDUCED TPC-H (no partsupp table; lineitem has
no commitdate/receiptdate/shipmode/shipinstruct/comment; orders has no
comment/clerk/shippriority; customer has no phone/address; part has no
container/mfgr). Queries whose core join/aggregate structure survives
are implemented — faithfully where every referenced column exists,
otherwise with the predicate ADAPTED to an available column and the
adaptation documented in the docstring. All 22 queries are covered:
Q1/Q3/Q5/Q6/Q7/Q8/Q10/Q13/Q14/Q15/Q17/Q18/Q19/Q22 keep the spec's
structure on existing columns; Q2/Q4/Q9/Q11/Q12/Q16/Q20/Q21 (which
reference partsupp or dropped lineitem/orders columns) are STRUCTURAL
ANALOGS — the join/aggregate/subquery shape the query exists to
exercise is preserved, with the missing relation or column replaced by
a fixture-derivable equivalent documented per-query.

Float parity follows the house rule (see aggregates.py module doc):
every money aggregate is an exact DECIMAL(28,8) sum, ROUNDed to 4 dp
before one decimal→double conversion; ratios divide the two
already-rounded doubles in one identically-written expression; ordering
for LIMIT queries sorts the EXACT decimal (plus explicit key
tiebreaks), never the rounded double.

Scale notes: these are the classic warehouse plans — one fact shuffle
per aggregation grain, partial+final hash aggregation throughout.
Broadcast hints are placed ONLY on sides whose size does not grow with
the scale factor: nation (25 rows), region (5), and 1-row scalar
aggregates (Q15's max, Q22's average). supplier/part/customer and the
decorrelated per-part aggregates grow ∝ SF, so their join strategy is
left to AQE — it broadcasts them at fixture scale and switches to
shuffle joins when runtime stats say they no longer fit, which is the
correct behavior at 100 TB (a forced broadcast there would OOM the
driver).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


def _dec(c: Column | str, scale: int = 8) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(f"decimal(28,{scale})")


def _money(c: Column, alias: str) -> Column:
    """Exact decimal sum → one ROUND(4) → one decimal→double cast."""
    return F.round(F.sum(_dec(c)), 4).cast("double").alias(alias)


def _disc_price() -> Column:
    # built lazily: Column construction needs an active SparkContext,
    # and this module imports at registry load time, before any session
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(28,8))), 4) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,8))), 4) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 4) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,8))), 4) AS DOUBLE) AS sum_charge,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(28,8))), 4) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,8))), 4) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(28,8))), 4) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-08-06'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report), faithful. The full 8-aggregate
    set; avgs derived from the exact decimal sums (never the engines'
    float accumulators). Date constant shifted to the fixture's
    1995-2001 calendar (shipdate horizon − ~90 days)."""
    li = load(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-08-06").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money(F.col("l_quantity"), "sum_qty"),
            _money(F.col("l_extendedprice"), "sum_base_price"),
            _money(_disc_price(), "sum_disc_price"),
            _money(_disc_price() * (1 + F.col("l_tax")), "sum_charge"),
            (F.round(F.sum(_dec("l_quantity")), 4).cast("double") / n).alias("avg_qty"),
            (F.round(F.sum(_dec("l_extendedprice")), 4).cast("double") / n).alias("avg_price"),
            (F.round(F.sum(_dec("l_discount")), 4).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q_tpch_q3",
    oracle="""
    SELECT l_orderkey,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 4) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) DESC,
             o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority). Adapted: fixture orders has no
    o_shippriority, so that passthrough column is omitted; l_orderkey
    added as the final tiebreak for a deterministic LIMIT. Ordering
    sorts the EXACT decimal revenue; the rounded double is only
    emitted."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_dec(_disc_price())).alias("rev_dec"))
        .orderBy(F.col("rev_dec").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            F.round("rev_dec", 4).cast("double").alias("revenue"),
            "o_orderdate",
        )
    )


@register(
    "q_tpch_q5",
    oracle="""
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 4) AS DOUBLE) AS revenue
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND c_nationkey = s_nationkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) DESC, n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume), faithful. The classic
    star-plus-locality join: customer and supplier must share a nation.
    nation/region are hinted broadcasts (fixed 25/5 rows at any SF);
    supplier's strategy is AQE's call (∝ SF). The fact side shuffles
    once for the final n_name aggregation.

    Join-order note: `r_name = 'ASIA'` is resolved into the tiny
    nation⋈region product FIRST and that ~|region|-fold-smaller nation
    list broadcast-joins the CUSTOMER side before any fact join —
    `c_nationkey = s_nationkey` then carries the region cut to the
    supplier side transitively, so orders/lineitem rows of
    out-of-region customers never enter the join at all (Catalyst
    cannot derive this itself: the region predicate reaches customer
    only through the c=s nation equality)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_n = n.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    c2 = c.join(
        F.broadcast(asia_n), F.col("c_nationkey") == F.col("n_nationkey")
    )
    return (
        c2.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(_dec(_disc_price())).alias("rev_dec"))
        .orderBy(F.col("rev_dec").desc(), "n_name")
        .select("n_name", F.round("rev_dec", 4).cast("double").alias("revenue"))
    )


@register(
    "q_tpch_q6",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,8))), 4) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change), faithful. Pure
    scan+filter+global-agg — the whole query pushes to one codegen
    stage over the parquet scan. The 0.05/0.07 literals compare
    identically on both engines (same IEEE doubles both sides)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_money(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


@register(
    "q_tpch_q7",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 4) AS DOUBLE) AS volume
    FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                  JOIN orders   ON o_orderkey = l_orderkey
                  JOIN customer ON c_custkey = o_custkey
                  JOIN nation sn ON s_nationkey = sn.n_nationkey
                  JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY sn.n_name, cn.n_name, CAST(YEAR(l_shipdate) AS BIGINT)
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping), faithful (nation names from the
    fixture vocabulary). The nation dimension joins twice under
    different roles — supplier side and customer side — each a
    broadcast. The disjunctive nation-PAIR predicate cannot be pushed
    below the joins by Catalyst (it spans both sides), but its per-side
    implication — supplier AND customer must each be in one of the two
    named nations — can: both role dims are pre-filtered to the two
    nations BEFORE touching the fact chain, so only the ~2/|nation|
    slice of suppliers/customers (and, transitively, lineitems and
    orders) ever enters a join. Only the cross-pair test remains
    post-join. At 25 nations that is ~12× less fact-join input than
    filtering after the star is assembled."""
    two = ("NATION_1", "NATION_2")
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    sn = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*two))
        .select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    cn = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*two))
        .select(
            F.col("n_nationkey").alias("cn_key"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    s2 = s.join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
    c2 = c.join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
    return (
        s2.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c2, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_dec(_disc_price())).alias("vol_dec"))
        .orderBy("supp_nation", "cust_nation", "l_year")
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.round("vol_dec", 4).cast("double").alias("volume"),
        )
    )


@register(
    "q_tpch_q8",
    oracle="""
    WITH all_nations AS (
        SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8)) AS volume,
               sn.n_name AS supp_nation
        FROM part JOIN lineitem ON p_partkey = l_partkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN orders   ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation cn ON c_nationkey = cn.n_nationkey
                  JOIN region   ON cn.n_regionkey = r_regionkey
                  JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'AMERICA'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
          AND p_type = 'STANDARD'
    )
    SELECT o_year,
           CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(28,8)) END), 4) AS DOUBLE)
             / CAST(ROUND(SUM(volume), 4) AS DOUBLE) AS mkt_share
    FROM all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share). Adapted: fixture p_type has a
    flat 6-word vocabulary, so the part filter is `p_type = 'STANDARD'`
    instead of the spec's three-word type. The share is the division of
    the two independently-rounded decimal sums — one identically-written
    double op on both engines. Join order: the two selective cuts —
    p_type on part, r_name resolved into an AMERICA-nation key list
    broadcast onto customer — are applied to their dimensions BEFORE
    the fact chain, so lineitem/orders rows outside the part slice or
    the region never join."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    cn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    sn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    zero = F.lit(0).cast("decimal(28,8)")
    vol = _dec(_disc_price())
    america_n = cn.join(
        F.broadcast(r), F.col("cn_region") == F.col("r_regionkey")
    ).select("cn_key")
    c2 = c.join(F.broadcast(america_n), F.col("c_nationkey") == F.col("cn_key"))
    return (
        p.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c2, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero)).alias("nat_dec"),
            F.sum(vol).alias("all_dec"),
        )
        .orderBy("o_year")
        .select(
            "o_year",
            (
                F.round("nat_dec", 4).cast("double")
                / F.round("all_dec", 4).cast("double")
            ).alias("mkt_share"),
        )
    )


@register(
    "q_tpch_q10",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 4) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting). Adapted: fixture customer
    has no address/phone/comment, so those passthrough columns are
    omitted; c_custkey is the deterministic tiebreak. c_acctbal is a
    raw parquet double passthrough (identical bits both sides)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_dec(_disc_price())).alias("rev_dec"))
        .orderBy(F.col("rev_dec").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.round("rev_dec", 4).cast("double").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


@register(
    "q_tpch_q14",
    oracle="""
    SELECT 100.00
           * CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
                                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))
                                 ELSE CAST(0 AS DECIMAL(28,8)) END), 4) AS DOUBLE)
           / CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 4) AS DOUBLE)
           AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect), faithful — the fixture's p_type
    vocabulary includes a literal 'PROMO' class (spec uses a LIKE
    'PROMO%' prefix; the fixture flattens types to one word). Part is a
    broadcast; the month of lineitem aggregates map-side."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(28,8)")
    vol = _dec(_disc_price())
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)).alias("promo_dec"),
            F.sum(vol).alias("all_dec"),
        )
        .select(
            (
                F.lit(100.00)
                * F.round("promo_dec", 4).cast("double")
                / F.round("all_dec", 4).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "q_tpch_q15",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) AS total_dec
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(ROUND(total_dec, 4) AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_dec = (SELECT MAX(total_dec) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier), faithful. The max-revenue scalar joins
    back as a broadcast 1-row aggregate — equality on the EXACT decimal,
    so ties surface every top supplier deterministically (the spec's
    view + scalar subquery shape, decorrelated Spark-side)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_dec(_disc_price())).alias("total_dec")
    )
    top = revenue.agg(F.max("total_dec").alias("max_dec"))
    return (
        revenue.join(F.broadcast(top), F.col("total_dec") == F.col("max_dec"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .orderBy("s_suppkey")
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_dec", 4).cast("double").alias("total_revenue"),
        )
    )


@register(
    "q_tpch_q17",
    oracle="""
    WITH pt AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3' AND p_size < 15),
    stats AS (
        SELECT l_partkey,
               COUNT(*) AS n_li,
               SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS sum_qty_i
        FROM lineitem JOIN pt ON l_partkey = p_partkey
        GROUP BY l_partkey
    )
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,8))), 4) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem JOIN stats ON lineitem.l_partkey = stats.l_partkey
    WHERE 5 * n_li * CAST(ROUND(l_quantity) AS BIGINT) < sum_qty_i
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue). Adapted: fixture part
    has no p_container, so the part filter is brand + `p_size < 15`.
    The correlated `l_quantity < 0.2 * avg(l_quantity)` subquery is
    decorrelated into per-part (count, integer quantity sum) aggregates
    joined back (strategy left to AQE: one row per brand part — small
    at fixture scale, ∝ SF at 100 TB), and the
    comparison is cross-multiplied to pure integers:
    qty < sum/(5·n) ⟺ 5·n·qty < sum (fixture quantities are whole
    numbers; ROUND→BIGINT makes that exact on both engines)."""
    pt = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 15)
    ).select("p_partkey")
    li = load(spark, sf_dir, "lineitem")
    qty_i = F.round(F.col("l_quantity"), 0).cast("long")
    # (r13 optimization round) per-part stats as unordered-frame WINDOW
    # aggregates over the part-filtered rows: the former decorrelated
    # shape scanned lineitem twice (once into the stats aggregation,
    # once as the outer side of the join back) and shuffled the full
    # fact table into that join. One part-filtered scan, one part-keyed
    # exchange; the 5·n·qty < sum predicate and the final decimal sum
    # are unchanged.
    from pyspark.sql import Window as W

    wp = W.partitionBy("l_partkey")
    return (
        li.join(pt, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .withColumn("n_li", F.count(F.lit(1)).over(wp))
        .withColumn("sum_qty_i", F.sum(qty_i).over(wp))
        .filter(5 * F.col("n_li") * qty_i < F.col("sum_qty_i"))
        .agg(
            (F.round(F.sum(_dec("l_extendedprice")), 4).cast("double") / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q_tpch_q18",
    oracle="""
    WITH big AS (
        -- outer CAST: SUM(BIGINT) is HUGEINT and sum_qty_i is EMITTED —
        -- pandas-fetched HUGEINT becomes float64 vs Spark int64 (the r4
        -- hash-fail class; q17 keeps its uncast SUM internal-only)
        SELECT l_orderkey AS bk,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty_i
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 300
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           sum_qty_i
    FROM big JOIN orders   ON o_orderkey = bk
             JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer), faithful structure with the
    300-quantity threshold kept (fixture orders reach ~458). Quantity
    sums are exact integers (whole-number fixture quantities);
    o_orderkey is the added deterministic tiebreak. The HAVING
    pre-aggregation shrinks the fact side before the customer join —
    the spec's IN-subquery shape decorrelated."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    qty_i = F.round(F.col("l_quantity"), 0).cast("long")
    big = (
        li.groupBy(F.col("l_orderkey").alias("bk"))
        .agg(F.sum(qty_i).alias("sum_qty_i"))
        .filter(F.col("sum_qty_i") > 300)
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("bk"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty_i",
        )
    )


@register(
    "q_tpch_q19",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 4) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicate). Adapted:
    fixture lineitem has no shipmode/shipinstruct and part no container,
    so each disjunct keeps the spec's (brand, quantity band, size band)
    core. The three-way OR stays one join + one residual filter — the
    planner must not expand it into a union of three scans. The
    per-side ENVELOPE of the disjunction (brand ∈ {1,2,3} ∧ size 1-15
    on part; quantity 1-30 on lineitem) is conjoined explicitly so each
    scan prunes before the join — the CNF-extraction rewrite the spec
    query is the canonical test of, done by hand because Catalyst only
    extracts exact common conjuncts, not range unions."""
    q, sz = F.col("l_quantity"), F.col("p_size")
    li = load(spark, sf_dir, "lineitem").filter((q >= 1) & (q <= 30))
    p = load(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & sz.between(1, 15)
    )
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 5) & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 10) & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 15) & (q >= 20) & (q <= 30))
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(_money(_disc_price(), "revenue"))
    )


@register(
    "q_tpch_q22",
    oracle="""
    WITH pos AS (
        SELECT COUNT(*) AS n_pos,
               SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS sum_c
        FROM customer WHERE c_acctbal > 0.0
    ),
    candidates AS (
        SELECT c_custkey, c_nationkey % 10 AS cntrycode,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c
        FROM customer, pos
        WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * n_pos > sum_c
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '1999-01-01'
          )
    )
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(bal_c) AS BIGINT) AS totacctbal_c
    FROM candidates
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity). Adapted twice for the
    fixture: the country code comes from `c_nationkey % 10` (no c_phone
    column to substring), and "customers without orders" becomes
    "without orders since 1999" (every fixture customer has SOME order;
    the spec's intent is dormant accounts). The above-average-balance
    test is the integer cross-multiplication bal·n > sum over exact
    cents — no decimal division anywhere — and the scalar (n, sum)
    enters as a broadcast 1-row join, not a driver round-trip. Output
    balance stays integer cents (the r1-r3 hasher discipline)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    bal_c = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    pos = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.count(F.lit(1)).alias("n_pos"),
            F.sum(bal_c).alias("sum_c"),
        )
    )
    return (
        c.select("c_custkey", "c_nationkey", bal_c.alias("bal_c"))
        .crossJoin(F.broadcast(pos))
        .filter(F.col("bal_c") * F.col("n_pos") > F.col("sum_c"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 10).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal_c").alias("totacctbal_c"),
        )
        .orderBy("cntrycode")
    )


@register(
    "q_tpch_q2",
    oracle="""
    WITH ps AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,8))), 4) AS DOUBLE)
                 / CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(28,8))), 4) AS DOUBLE) AS unit_price
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    ranked AS (
        SELECT pk, sk, unit_price,
               ROW_NUMBER() OVER (PARTITION BY pk ORDER BY unit_price, sk) AS rn
        FROM ps JOIN supplier ON sk = s_suppkey
                JOIN nation   ON s_nationkey = n_nationkey
                JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
           unit_price
    FROM ranked JOIN part     ON pk = p_partkey
                JOIN supplier ON sk = s_suppkey
                JOIN nation   ON s_nationkey = n_nationkey
    WHERE rn = 1 AND p_size = 15
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), structural analog. The fixture
    has no partsupp, so the part↔supplier relation is the DISTINCT
    (l_partkey, l_suppkey) pairs observed in lineitem and "supply cost"
    is the realized unit price sum(extendedprice)/sum(quantity) — the
    correlated MIN subquery of the spec becomes an arg-min per part
    (row_number over (price, suppkey): the suppkey tiebreak makes the
    selection deterministic at price ties). p_mfgr/s_address/s_phone/
    s_comment passthroughs don't exist and are omitted; the mfgr-less
    part filter keeps p_size = 15 only.

    Parity: unit_price is the division of the two independently-rounded
    decimal sums — one identically-written double op per (pk, sk) row on
    both engines, compared (not re-aggregated) thereafter and emitted
    RAW (a further ROUND(double, 4) would re-introduce the
    rendering-vs-binary rounding divergence)."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    from pyspark.sql import Window

    # The size-15 part filter prunes the fact side BEFORE the wide
    # (pk, sk) aggregation: unit prices are per-(part, supplier), so
    # restricting to qualifying parts up front is semantics-preserving
    # and cuts the aggregation input by the filter's selectivity —
    # at 100 TB this is the difference between aggregating the whole
    # fact table and ~2% of it. Semi-join strategy left to AQE (part
    # grows ∝ SF; module-doc broadcast rule).
    ps = (
        li.join(
            p.select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(
            (
                F.round(F.sum(_dec("l_extendedprice")), 4).cast("double")
                / F.round(F.sum(_dec("l_quantity")), 4).cast("double")
            ).alias("unit_price")
        )
    )
    ranked = (
        ps.join(s, F.col("sk") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("pk").orderBy("unit_price", "sk")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return (
        ranked.join(p, F.col("pk") == F.col("p_partkey"))
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            # RAW double: the ratio of the two already-rounded decimal
            # sums is one identically-written IEEE division on both
            # engines — bit-equal. ROUND(double, 4) on it would add the
            # rendering-vs-binary divergence for clean 2dp/int ratios
            # (e.g. x.xx/8 terminates in 5 at the 5th decimal).
            "unit_price",
        )
    )


@register(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), structural analog. The spec's
    lateness test (l_commitdate < l_receiptdate) uses columns the
    fixture lacks; the analog keeps the identical EXISTS-semi-join
    shape with "shipped more than 90 days after the order date" as the
    lateness predicate. The semi join carries the cross-side condition,
    so each order is counted once no matter how many late lines it
    has."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q_tpch_q11",
    oracle="""
    WITH nat_value AS (
        SELECT l_partkey AS pk,
               SUM(CAST(l_extendedprice AS DECIMAL(28,8))) AS val_dec
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                      JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5'
        GROUP BY l_partkey
    ),
    total AS (SELECT SUM(val_dec) AS tot_dec FROM nat_value)
    SELECT pk AS p_partkey,
           CAST(ROUND(val_dec, 4) AS DOUBLE) AS value
    FROM nat_value, total
    WHERE val_dec * 1000 > tot_dec
    ORDER BY val_dec DESC, pk
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification), structural analog.
    partsupp value (ps_supplycost·ps_availqty) becomes realized revenue
    per part from the target nation's suppliers; the spec's
    HAVING-greater-than-scalar-subquery shape is kept with threshold
    0.001 of the national total. The scalar total enters as a broadcast
    1-row join, and the comparison is the decimal cross-multiplication
    val·1000 > total — exact, no float fraction anywhere."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    nat_value = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.sum(_dec("l_extendedprice")).alias("val_dec"))
    )
    total = nat_value.agg(F.sum("val_dec").alias("tot_dec"))
    return (
        nat_value.crossJoin(F.broadcast(total))
        .filter(F.col("val_dec") * 1000 > F.col("tot_dec"))
        .orderBy(F.col("val_dec").desc(), "pk")
        .select(
            F.col("pk").alias("p_partkey"),
            F.round("val_dec", 4).cast("double").alias("value"),
        )
    )


@register(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution), faithful structure. The spec's
    `o_comment NOT LIKE '%special%requests%'` exclusion is dropped —
    the fixture has no o_comment — leaving the two-level aggregation
    over a LEFT join that the query exists to exercise (COUNT of a
    nullable column so order-less customers land in the 0 bucket)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q_tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), structural analog. The
    part↔supplier relation comes from lineitem pairs (no partsupp), the
    p_type NOT-LIKE filter collapses into the brand exclusion (flat
    one-word fixture types), and the supplier-complaint NOT IN subquery
    is dropped (no s_comment). The grouped COUNT(DISTINCT) over an
    8-value size IN-list — the query's point — is unchanged."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q_tpch_q21",
    oracle="""
    WITH per_supp AS (
        SELECT l_orderkey AS ok, l_suppkey AS sk, MAX(l_shipdate) AS supp_max
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY l_orderkey, l_suppkey
    ),
    per_order AS (
        SELECT ok, COUNT(*) AS n_supp, MAX(supp_max) AS order_max,
               COUNT(*) FILTER (WHERE supp_max = m) AS n_at_max
        FROM (SELECT *, MAX(supp_max) OVER (PARTITION BY ok) AS m FROM per_supp)
        GROUP BY ok
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM per_supp JOIN per_order USING (ok)
                  JOIN supplier ON sk = s_suppkey
                  JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'
      AND n_supp > 1 AND n_at_max = 1 AND supp_max = order_max
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), structural analog.
    The spec's "only supplier whose lineitems were late" (receipt vs
    commit dates) becomes "the STRICTLY LAST supplier to ship a
    multi-supplier 'F' order": the EXISTS (another supplier) /
    NOT EXISTS (another supplier shipping later-or-equal) pair is
    decorrelated into per-(order, supplier) max-shipdate aggregates and
    a per-order (supplier count, max, attainer count) rollup — two hash
    aggregations and a join instead of two correlated self-joins of the
    fact table, the shape that survives 100 TB. Counting per (order,
    supplier) — per_supp rows — makes numwait order-distinct by
    construction.

    Join-order note: the per-order aggregates must range over ALL
    suppliers (the EXISTS/NOT-EXISTS "another supplier" tests are
    global), so the nation filter cannot shrink them — but the WAITER
    CANDIDATE side can be cut to the named nation's suppliers BEFORE
    the three-way candidate⋈per_order⋈at_max join (1/|nation| of the
    rows), instead of filtering after the joins are assembled."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    per_supp = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk"))
        .agg(F.max("l_shipdate").alias("supp_max"))
    )
    # (r13 optimization round) the per-order rollups (supplier count,
    # order max, attainer count) are WINDOW aggregates over the same
    # (ok) partitioning, not separate groupBys: the former shape
    # referenced per_supp three times (per_order, at_max, candidate) —
    # re-running the lineitem⋈orders aggregation subtree and adding two
    # join exchanges. Now ONE pass: the (ok, sk) aggregate flows
    # through one ok-exchange carrying two unordered-frame Window
    # nodes (n_at compares against the first window's order_max, so it
    # rides a second Window over the same partitioning — no new
    # shuffle), then the winner filter and the broadcast nation join.
    # 3 fact-side subtrees + 2 join exchanges → 1 subtree + 1 window
    # exchange; same rows by construction.
    from pyspark.sql import Window as W

    w = W.partitionBy("ok")
    stats = per_supp.withColumn(
        "n_supp", F.count(F.lit(1)).over(w)
    ).withColumn("order_max", F.max("supp_max").over(w))
    stats = stats.withColumn(
        "n_at",
        F.sum(
            F.when(F.col("supp_max") == F.col("order_max"), 1).otherwise(0)
        ).over(w),
    )
    s5 = s.join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    return (
        stats.filter(
            (F.col("n_supp") > 1)
            & (F.col("n_at") == 1)
            & (F.col("supp_max") == F.col("order_max"))
        )
        .join(s5, F.col("sk") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@register(
    "q_tpch_q9",
    oracle="""
    SELECT n_name AS nation,
           CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 4) AS DOUBLE) AS sum_profit
    FROM part JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders   ON o_orderkey = l_orderkey
              JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product type profit measure), structural analog. The
    spec's profit subtracts ps_supplycost·l_quantity; with no partsupp
    table the amount reduces to realized revenue, keeping the query's
    point — a 4-way fact join grouped by (supplier nation, order year)
    with a part-name LIKE filter. nation broadcasts (25 rows); the
    LIKE-filtered part side is left to AQE (∝ SF at 100 TB)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    return (
        p.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(_money(_disc_price(), "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q_tpch_q12",
    oracle="""
    SELECT l_returnflag AS ship_class,
           COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
           COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAYS
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY ship_class
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority), structural analog.
    The fixture has no l_shipmode/l_commitdate/l_receiptdate, so the
    "mode" axis becomes l_returnflag and "received late" becomes
    "shipped >60 days after order date" (the Q4 analog's lateness
    proxy). The query's point — priority-conditional counts over a
    year-windowed fact/order join, grouped by a line attribute — is
    unchanged. The lateness predicate is a join-time theta condition;
    both counts come from one hash aggregation (no double scan)."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@register(
    "q_tpch_q20",
    oracle="""
    WITH shipped AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_partkey, l_suppkey
    ),
    tot AS (
        SELECT l_partkey AS pk, SUM(qty) AS tot_qty
        FROM shipped GROUP BY l_partkey
    ),
    qual AS (
        SELECT DISTINCT l_suppkey
        FROM shipped JOIN tot  ON l_partkey = pk
                     JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE '%bolt%' AND 2 * qty > tot_qty
    )
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'
      AND s_suppkey IN (SELECT l_suppkey FROM qual)
    ORDER BY s_name
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), structural analog. The
    spec asks for suppliers holding excess stock (ps_availqty > half
    the year's shipped quantity); with no partsupp, "excess" becomes
    "dominant shipper": suppliers who shipped MORE THAN HALF of a
    bolt-named part's total 1996 quantity. The nested IN(IN()) subquery
    chain is kept and decorrelated into two stacked integer hash
    aggregations (per part×supplier, then per part — the second shuffle
    moves only already-aggregated rows, orders of magnitude smaller
    than the fact table) and a LEFT SEMI join into the
    nation-filtered supplier table; 2·qty > tot is an exact integer
    comparison. s_acctbal is a raw parquet double passthrough
    (identical bits both sides, Q10 precedent)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    # The bolt-name filter is per-part, and both aggregations are keyed
    # by part — pushing the part semi-join ahead of them is
    # semantics-preserving and shrinks the aggregated fact rows to the
    # qualifying parts' share (strategy left to AQE; part grows ∝ SF).
    shipped = (
        li.join(
            p.select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round(F.col("l_quantity"), 0).cast("long")).alias("qty"))
    )
    # (r13 optimization round) the per-part total is a WINDOW aggregate
    # over the same part key, not a second groupBy + join: the former
    # shape referenced `shipped` twice (re-running the fact-side
    # aggregation subtree) and paid the tot-side join exchange — one
    # unordered-frame window over a single part-keyed exchange computes
    # the identical 2·qty > tot predicate (same q21 rework).
    from pyspark.sql import Window as W

    tot_qty = F.sum("qty").over(W.partitionBy("l_partkey"))
    qual = (
        shipped.withColumn("tot_qty", tot_qty)
        .filter(2 * F.col("qty") > F.col("tot_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qual, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .orderBy("s_name")
        .select("s_name", "s_acctbal")
    )
