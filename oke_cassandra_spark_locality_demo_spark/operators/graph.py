"""Iterative graph analytics over relational fixtures.

The reference executes no graph workload (SURVEY.md Appendix A), but an
engine replacing it at 100 TB needs the iterative-join pattern these ops
exercise: per-iteration shuffle joins keyed on the vertex id, lineage
truncation via localCheckpoint, and AQE-broadcast of the (small) rank
side. Companion to the connected-components loop in llm/dedup.py
(q_dedup_clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

_DAMP = 0.85
_ITERS = 3

# Chained (non-recursive) CTEs unroll the same fixed power iterations the
# Spark loop runs: standard SQL forbids aggregation in a recursive term,
# so fixed unrolling is the portable oracle formulation.
_PR_STEP = """
r{next} AS (
    SELECT r.id,
           0.15 / (SELECT n FROM nn) +
           0.85 * COALESCE(c.contrib, 0) AS rank
    FROM r{cur} r
    LEFT JOIN (
        SELECT w.dst AS id, SUM(w.wn * p.rank) AS contrib
        FROM w JOIN r{cur} p ON w.src = p.id
        GROUP BY w.dst
    ) c USING (id)
)"""

_PR_ORACLE = (
    """
    WITH e AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS cnt
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    ),
    w AS (
        SELECT src, dst,
               cnt * 1.0 / SUM(cnt) OVER (PARTITION BY src) AS wn
        FROM e
    ),
    nn AS (SELECT COUNT(*) AS n FROM nation),
    r0 AS (
        SELECT n_nationkey AS id, 1.0 / (SELECT n FROM nn) AS rank
        FROM nation
    ),"""
    + ",".join(_PR_STEP.format(cur=i, next=i + 1) for i in range(_ITERS))
    + f"""
    SELECT n.n_name AS nation, ROUND(r.rank, 6) AS pagerank
    FROM r{_ITERS} r JOIN nation n ON r.id = n.n_nationkey
    ORDER BY pagerank DESC, nation
    """
)


@register("q_graph_pagerank", oracle=_PR_ORACLE)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the customer-nation → supplier-nation trade
    graph (3 fixed power iterations, damping 0.85, no dangling
    redistribution — every nation trades at fixture scale). Two phases
    with opposite scale profiles: (1) edge extraction is the heavy
    relational part — lineitem⋈orders⋈customer⋈supplier with the two dim
    joins AQE-broadcast, aggregated down to ≤25² weighted edges; (2) the
    power iteration joins edges (partitioned by src) against the rank
    table and re-aggregates by dst — one shuffle per round at scale,
    broadcast here because ranks are tiny. localCheckpoint after edge
    extraction and per iteration truncates the growing lineage, the
    standard guard for iterative DataFrame algorithms. Oracle: the same
    iterations unrolled as chained CTEs (recursive terms can't aggregate
    in standard SQL). Reference analog: none — target-only capability;
    cites userdata/cloudinit.sh:346-351 as the reference's entire query
    surface."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")

    edges = (
        li.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(supp.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window

    w = edges.withColumn(
        "wn", F.col("cnt") / F.sum("cnt").over(Window.partitionBy("src"))
    ).select("src", "dst", "wn").localCheckpoint()

    n = nation.count()
    ranks = nation.select(
        F.col("n_nationkey").alias("id"), F.lit(1.0 / n).alias("rank")
    ).localCheckpoint()

    for _ in range(_ITERS):
        contrib = (
            w.join(ranks, w.src == ranks.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("wn") * F.col("rank")).alias("contrib"))
        )
        ranks = (
            ranks.select("id")
            .join(contrib, "id", "left")
            .select(
                "id",
                (F.lit(0.15 / n)
                 + F.lit(_DAMP) * F.coalesce(F.col("contrib"), F.lit(0.0))
                 ).alias("rank"),
            )
            .localCheckpoint()
        )

    return (
        ranks.join(nation, ranks.id == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.round("rank", 6).alias("pagerank"),
        )
        .orderBy(F.col("pagerank").desc(), "nation")
    )
