"""SQL-surface features: subqueries (scalar / IN / correlated EXISTS)
and recursive CTEs — Catalyst's subquery machinery and Spark 4's
WITH RECURSIVE, exercised through the SQL API (both re-expressible in
DuckDB, so fully oracle-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load, register_views
from ..registry import EVENTS_US, register


@register(
    "q_subqueries",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice,
           o.o_totalprice / (SELECT MAX(o2.o_totalprice) FROM orders o2) AS price_share,
           (o.o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'))
               AS is_building,
           EXISTS (SELECT 1 FROM lineitem l
                   WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
               AS has_bulk_line
    FROM orders o
    WHERE o.o_totalprice > 350000
    """,
)
def q_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (broadcast 1-row), uncorrelated IN (left-semi
    rewrite), and correlated EXISTS (semi join after decorrelation) — the
    three subquery shapes Catalyst plans without any correlated re-scan.
    price_share divides two exact doubles from the data, so it is
    bit-identical across engines."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_totalprice,
               o.o_totalprice / (SELECT MAX(o2.o_totalprice) FROM orders o2)
                   AS price_share,
               (o.o_custkey IN (SELECT c_custkey FROM customer
                                WHERE c_mktsegment = 'BUILDING')) AS is_building,
               EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
                   AS has_bulk_line
        FROM orders o
        WHERE o.o_totalprice > 350000
        """
    )


@register(
    "q_recursive_cte",
    oracle="""
    WITH RECURSIVE spine(d) AS (
        SELECT DATE '1995-01-01'
        UNION ALL
        SELECT d + 1 FROM spine WHERE d < DATE '1995-03-31'
    )
    SELECT s.d AS day,
           COALESCE(o.n, 0) AS n_orders
    FROM spine s
    LEFT JOIN (
        SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
        FROM orders GROUP BY 1
    ) o ON s.d = o.d
    """,
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): Q1-1995 date spine, left-
    joined to per-day order counts — the densification pattern that
    zero-fills gaps in a time series. The spine is generated, not
    scanned, so its cost is independent of data volume."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE spine(d) AS (
            SELECT DATE '1995-01-01'
            UNION ALL
            SELECT date_add(d, 1) FROM spine WHERE d < DATE '1995-03-31'
        )
        SELECT s.d AS day,
               COALESCE(o.n, CAST(0 AS BIGINT)) AS n_orders
        FROM spine s
        LEFT JOIN (
            SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
            FROM orders GROUP BY 1
        ) o ON s.d = o.d
        """
    )


@register(
    "q_join_lateral",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, t.n_lines, t.max_line_price
    FROM orders o,
         LATERAL (SELECT COUNT(*) AS n_lines,
                         MAX(l.l_extendedprice) AS max_line_price
                  FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey) t
    WHERE o.o_totalprice > 400000
    """,
)
def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: per-order line stats computed by a
    multi-column correlated aggregate in the FROM clause. Catalyst
    decorrelates it into a single aggregate + join rather than
    re-scanning lineitem per outer row — the property that makes the
    per-row-subquery *syntax* safe at 100 TB. Orders with no lines
    surface as n_lines=0 (ungrouped aggregate over empty input), which
    a plain inner-join rewrite would silently drop."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_totalprice, t.n_lines, t.max_line_price
        FROM orders o,
             LATERAL (SELECT COUNT(*) AS n_lines,
                             MAX(l.l_extendedprice) AS max_line_price
                      FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey) t
        WHERE o.o_totalprice > 400000
        """
    )


@register(
    "q_sql_pipe",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n,
           ROUND(AVG(l_discount), 4) AS avg_disc
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4): the flagship Q1 shape written as a
    linear `FROM |> WHERE |> AGGREGATE |> ORDER BY` dataflow — each
    stage reads top-to-bottom like the DataFrame API while remaining
    pure SQL. Catalyst compiles it to exactly the plan of the nested
    form (pushdown, partial aggregation, and codegen all apply), so
    this checks the parser surface, not new semantics — the oracle is
    the classic formulation."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |> AGGREGATE CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                         AS sum_qty,
                     COUNT(*) AS n,
                     ROUND(AVG(l_discount), 4) AS avg_disc
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, sum_qty, n, avg_disc
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


@register(
    "q_sql_params",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_totalprice > 100000.0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_sql_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4): named parameter markers for values
    and the IDENTIFIER() clause for the table name — the
    injection-safe way to template queries (string-concatenated SQL is
    both unsafe and uncacheable as a parse tree; parameter markers keep
    one plan shape across invocations). The oracle runs the fully
    bound query — binding must not change semantics."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice > :min_total
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"tbl": "orders", "min_total": 100000.0},
    )


@register(
    "q_sql_scripting",
    oracle=f"""
    WITH v AS (
        SELECT CAST(ROUND(value * 10000.0) AS BIGINT) AS v_tt
        FROM {EVENTS_US}
    ),
    n AS (SELECT COUNT(*) AS n_events,
                 CAST(FLOOR(COUNT(*) * 0.1) AS BIGINT) AS target
          FROM v),
    r AS (SELECT v_tt, ROW_NUMBER() OVER (ORDER BY v_tt) AS rn FROM v)
    SELECT n.n_events, n.target,
           (SELECT v_tt FROM r WHERE rn = n.n_events - n.target)
               AS threshold_tt
    FROM n
    """,
)
def q_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING (Spark 4.0 procedural SQL: BEGIN/DECLARE/WHILE/IF)
    driving real data queries: a bisection loop finds the exact p90
    threshold — the smallest integer t with at most 10% of values above
    it — by issuing one COUNT per iteration against the events view and
    halving the bracket. ~23 iterations of O(1)-state control flow on
    the driver, each a full scannable predicate Catalyst optimizes like
    any other query; no window sort of the corpus. The converged
    threshold equals the (n−target)-th order statistic EXACTLY (integer
    bisection is exact), which is what the rank-selection oracle checks
    — control flow, scalar subqueries, and session-variable state all
    have to be right for the integers to match. The 10% target uses an
    explicit FLOOR: bare CAST(double AS BIGINT) truncates on Spark but
    rounds half-away on DuckDB (measured 101.5 → 101 vs 102), a
    divergence the fixture's power-of-ten row counts would mask."""
    register_views(spark, sf_dir)
    prev = spark.conf.get("spark.sql.scripting.enabled", "false")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(
            """
            BEGIN
              DECLARE n_events BIGINT DEFAULT 0;
              DECLARE target BIGINT DEFAULT 0;
              DECLARE lo BIGINT DEFAULT 0;
              DECLARE hi BIGINT DEFAULT 0;
              DECLARE mid BIGINT;
              SET n_events = (SELECT COUNT(*) FROM events);
              SET target = CAST(FLOOR(n_events * 0.1) AS BIGINT);
              SET hi = (
                  SELECT MAX(CAST(ROUND(value * 10000.0) AS BIGINT)) FROM events);
              WHILE lo < hi DO
                SET mid = (lo + hi) DIV 2;
                IF (SELECT COUNT(*) FROM events
                    WHERE CAST(ROUND(value * 10000.0) AS BIGINT) > mid) > target
                THEN
                  SET lo = mid + 1;
                ELSE
                  SET hi = mid;
                END IF;
              END WHILE;
              SELECT n_events, target, lo AS threshold_tt;
            END
            """
        )
    finally:
        spark.conf.set("spark.sql.scripting.enabled", prev)


@register(
    "q_fn_sql_udf",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount)
                               * (1.0 + l_tax) * 100) AS BIGINT))
                AS BIGINT) AS charge_cents,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_fn_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language scalar UDF (Spark 4 `CREATE FUNCTION ... RETURN
    expr`): the pricing-charge expression is declared once as a named
    SQL function and reused in a query — the declarative UDF surface
    that, unlike Python UDFs, stays ENTIRELY inside Catalyst: the
    function body is inlined into the plan at analysis time, so
    predicate pushdown, whole-stage codegen, and vectorized evaluation
    all apply — zero serialization boundary (the top rung of the cost
    ladder documented in functions/udf.py).

    The oracle inlines the identical expression text — digit-identical
    IEEE chain on both engines, rounded once at scale 0 to integer
    cents (the FIXTURES.md convention), summed exactly as BIGINT.
    `CREATE OR REPLACE` keeps the definition idempotent across repeated
    invocations in one session."""
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION charge_cents(
            p DOUBLE, d DOUBLE, t DOUBLE
        ) RETURNS BIGINT
        RETURN CAST(ROUND(p * (1.0 - d) * (1.0 + t) * 100) AS BIGINT)
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               SUM(charge_cents(l_extendedprice, l_discount, l_tax))
                   AS charge_cents,
               COUNT(*) AS n_items
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@register(
    "q_sql_group_by_all",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice, 0) AS BIGINT)) AS BIGINT)
               AS rev
    FROM orders
    GROUP BY ALL
    ORDER BY o_orderpriority, o_orderstatus
    """,
)
def q_sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — the analyst-ergonomics SQL surface (infer the
    grouping keys from the non-aggregate select items) that Spark 4
    and DuckDB both ship with identical inference rules, so the oracle
    runs the SAME query text modulo dialect casts. Plans identically
    to an explicit GROUP BY (one hash aggregation with map-side
    partials) — the feature is parser sugar, and this key pins that
    equivalence. Companion to q_sql_pipe / q_sql_params /
    q_sql_scripting in the modern-SQL-surface family."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               COUNT(*) AS n,
               SUM(CAST(ROUND(o_totalprice, 0) AS BIGINT)) AS rev
        FROM orders
        GROUP BY ALL
        ORDER BY o_orderpriority, o_orderstatus
        """
    )


@register(
    "q_sql_qualify",
    oracle="""
    SELECT o_orderpriority,
           o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY o_orderpriority
        ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC, o_orderkey
    ) <= 2
    ORDER BY o_orderpriority, price_cents DESC, o_orderkey
    """,
)
def q_sql_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY surface — the post-window filter clause (DuckDB /
    Snowflake / BigQuery dialects; the oracle runs it natively). Spark
    has no QUALIFY keyword, so the engine exposes the canonical rewrite
    every QUALIFY implementation performs internally: project the
    window function, filter on it, drop the helper column — which is
    exactly what Catalyst would plan for a native QUALIFY (one
    hash-partitioned sort per o_orderpriority, filter before the final
    projection; no extra shuffle vs the keyword form). Deterministic
    under ties via the (price, orderkey) composite order. Distinct from
    q_topk_per_group (DataFrame-API top-k): this key pins the SQL
    dialect surface, like q_sql_pipe / q_sql_group_by_all."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    orders = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = W.partitionBy("o_orderpriority").orderBy(
        cents.desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            cents.alias("price_cents"),
            F.row_number().over(w).alias("_rn"),
        )
        .filter(F.col("_rn") <= 2)
        .drop("_rn")
        .orderBy(
            "o_orderpriority", F.col("price_cents").desc(), "o_orderkey"
        )
    )


@register(
    "q_sql_window_clause",
    oracle="""
    SELECT o_orderpriority,
           o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                OVER w2 AS BIGINT) AS run_cents
    FROM orders
    WHERE o_orderkey % 101 = 0
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC,
                          o_orderkey),
           w2 AS (PARTITION BY o_orderpriority
                  ORDER BY o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_orderpriority, o_orderkey
    """,
)
def q_sql_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NAMED WINDOW CLAUSE surface — the `WINDOW w AS (...)` SQL-dialect
    feature (shared spec, referenced by multiple functions), run through
    spark.sql on BOTH engines' native parsers: the same statement text
    modulo nothing — Spark and DuckDB both support the clause, so this
    key pins cross-dialect WINDOW-clause parity the way q_sql_pipe /
    q_sql_group_by_all pin theirs. Two distinct named specs (a rank
    order and a running frame) prove the clause binds per-name, not
    per-query. The %101 projection keeps emission small; all columns
    integer. Reference analog: none — target-only capability."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
               CAST(RANK() OVER w AS BIGINT) AS rnk,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    OVER w2 AS BIGINT) AS run_cents
        FROM orders
        WHERE o_orderkey % 101 = 0
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC,
                              o_orderkey),
               w2 AS (PARTITION BY o_orderpriority
                      ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY o_orderpriority, o_orderkey
        """
    )


@register(
    "q_sql_distinct_on",
    oracle="""
    SELECT DISTINCT ON (o_custkey)
           o_custkey, o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders
    WHERE o_custkey % 17 = 0
    ORDER BY o_custkey, CAST(o_orderdate AS DATE) DESC, o_orderkey
    """,
)
def q_sql_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON surface — the Postgres/DuckDB idiom for "one row per
    key, picked by an ORDER BY" (each customer's most recent order
    here). Spark has no DISTINCT ON keyword; the engine exposes the
    exact rewrite every implementation uses — row_number over
    (key, order) filtered to 1 — which Catalyst additionally optimizes
    with WindowGroupLimit (rank pruned inside the sort, before the
    shuffle materializes losers). Ties broken by orderkey so both
    engines pick the same row. Third member of the dialect-surface
    family (q_sql_qualify, q_sql_distinct_on, q_sql_window_clause).
    Reference analog: none — target-only capability."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    orders = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 17 == 0)
    w = W.partitionBy("o_custkey").orderBy(
        F.to_date("o_orderdate").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias(
                "price_cents"
            ),
            F.row_number().over(w).alias("_rn"),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy("o_custkey")
    )
