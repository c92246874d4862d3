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

from ..ckpt import release_checkpoint, tracked_local_checkpoint
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
    ).select("src", "dst", "wn")
    w = tracked_local_checkpoint(w)

    n = nation.count()
    ranks = tracked_local_checkpoint(
        nation.select(
            F.col("n_nationkey").alias("id"), F.lit(1.0 / n).alias("rank")
        )
    )

    for _ in range(_ITERS):
        contrib = (
            w.join(ranks, w.src == ranks.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("wn") * F.col("rank")).alias("contrib"))
        )
        new_ranks = tracked_local_checkpoint(
            ranks.select("id")
            .join(contrib, "id", "left")
            .select(
                "id",
                (F.lit(0.15 / n)
                 + F.lit(_DAMP) * F.coalesce(F.col("contrib"), F.lit(0.0))
                 ).alias("rank"),
            )
        )
        # the new iterate is fully materialized (eager checkpoint), so
        # the previous round's block set is provably dead — release it
        # instead of pinning O(rounds) superseded sets until periodic
        # GC (ckpt.py safety contract)
        release_checkpoint(ranks)
        ranks = new_ranks
    # the edge table is loop-only state: the returned plan reads ranks
    # and nation exclusively
    release_checkpoint(w)

    return (
        ranks.join(nation, ranks.id == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.round("rank", 6).alias("pagerank"),
        )
        .orderBy(F.col("pagerank").desc(), "nation")
    )


@register(
    "q_graph_triangles",
    oracle="""
    WITH li AS (
        SELECT l.l_orderkey, l.l_partkey
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
    ),
    e AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM li a
        JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    deg AS (
        SELECT n, COUNT(*) AS d
        FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e)
        GROUP BY 1
    ),
    o AS (
        SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                    THEN e.u ELSE e.v END AS s,
               CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                    THEN e.v ELSE e.u END AS t
        FROM e
        JOIN deg du ON e.u = du.n
        JOIN deg dv ON e.v = dv.n
    ),
    tri AS (
        SELECT o1.s AS a, o1.t AS b, o2.t AS c
        FROM o o1
        JOIN o o2 ON o1.s = o2.s AND o1.t < o2.t
        JOIN o o3 ON o3.s = o1.t AND o3.t = o2.t
    ),
    tc AS (
        SELECT n, COUNT(*) AS tri
        FROM (SELECT a AS n FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri)
        GROUP BY n
    )
    SELECT d.n AS part, CAST(d.d AS BIGINT) AS degree,
           CAST(COALESCE(tc.tri, 0) AS BIGINT) AS n_triangles,
           CAST(CASE WHEN d.d >= 2 THEN ROUND(
                    COALESCE(tc.tri, 0) * 2000000.0 / (d.d * (d.d - 1)))
                ELSE 0 END AS BIGINT) AS clustering_ppm
    FROM deg d LEFT JOIN tc ON d.n = tc.n
    ORDER BY part
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-node TRIANGLE COUNT + local clustering coefficient on
    the part co-purchase graph (parts sharing a 1995 order are
    adjacent) — the canonical one-round distributed graph analytic
    (Suri & Vassilvitskii 2011, "Counting Triangles and the Curse of
    the Last Reducer", public literature), and the structural sibling
    of the ITERATIVE loop in `q_graph_pagerank`.

    The scale story IS the algorithm: a naive adjacency self-join
    enumerates Σ C(deg,2) wedges, which the last hub reducer turns
    quadratic. Degree-ORIENTATION (each edge directed from its
    lower-degree endpoint, ties by id) makes every out-degree O(√m),
    bounding total wedges by O(m^1.5) and counting each triangle
    exactly once — no hub key ever explodes, no salting needed. Wedge
    generation + the closing-edge hash join are ordinary shuffles on
    integer keys; corner counts come from one explode + groupBy.
    Per-order pair blowup is bounded by TPC-H's ≤7 lineitems/order
    (C(7,2) = 21 pairs), and the year cut is pushed to the orders scan.
    All-integer emissions; clustering is the cross-multiplied
    `tri·2e6 / (d·(d−1))` — no half-integer division anywhere."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").between("1995-01-01", "1995-12-31"))
        .select("o_orderkey")
    )
    li = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
    e = (
        a.join(b, "k")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    o1 = o.select(F.col("s"), F.col("t").alias("b"))
    o2 = o.select(F.col("s"), F.col("t").alias("c"))
    wedges = o1.join(o2, "s").filter(F.col("b") < F.col("c"))
    closing = o.select(F.col("s").alias("b"), F.col("t").alias("c"))
    tri = wedges.join(closing, ["b", "c"]).select(
        F.col("s").alias("a"), "b", "c"
    )
    corners = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    t = F.coalesce(F.col("tri"), F.lit(0))
    d = F.col("d")
    return (
        deg.join(corners, "n", "left")
        .select(
            F.col("n").alias("part"),
            d.cast("long").alias("degree"),
            t.cast("long").alias("n_triangles"),
            F.when(
                d >= 2, F.round(t * 2000000.0 / (d * (d - 1)))
            )
            .otherwise(0)
            .cast("long")
            .alias("clustering_ppm"),
        )
        .orderBy("part")
    )


_BFS_CAP = 8  # hop bound; the 1995 co-purchase giant component has
# diameter <= 6 at both fixture scales (measured), so the cap is slack,
# not a truncation — and at any scale it bounds rounds, not coverage,
# because each extra hop is one more shuffle join, not more data.


@register(
    "q_graph_bfs",
    oracle="""
    WITH RECURSIVE li AS (
        SELECT l.l_orderkey, l.l_partkey
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
    ),
    e AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM li a
        JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    ed AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
    src AS (SELECT MIN(u) AS s FROM ed),
    bfs AS (
        SELECT s AS n, 0 AS d FROM src
        UNION
        SELECT ed.v, bfs.d + 1 FROM bfs JOIN ed ON bfs.n = ed.u
        WHERE bfs.d < 8
    )
    SELECT n AS part, CAST(MIN(d) AS BIGINT) AS hop
    FROM bfs GROUP BY n ORDER BY part
    """,
)
def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BREADTH-FIRST SEARCH hop distances on the 1995
    part co-purchase graph, from the lowest part id present in it —
    the frontier-expansion iteration that completes the graph triad
    (pagerank = fixpoint over ALL vertices each round, q_dedup_clusters
    = min-label fixpoint, BFS = work proportional to the FRONTIER).

    Each round is one shuffle join of the current frontier against the
    edge list keyed on the vertex id, then one anti-join against the
    visited set — never a pass over the whole graph — and the loop
    exits as soon as a frontier comes back empty (the `isEmpty` probe
    reads one partition of an already-checkpointed frame, it does not
    recompute lineage). `localCheckpoint` per round truncates the
    growing plan exactly as in q_dedup_clusters; rounds = eccentricity
    of the source, capped at _BFS_CAP. The sf0.01/sf0.1 giant
    component reaches 1,976 / 19,754 parts in <= 6 hops (measured), so
    the emission is non-vacuous at the driver's scale.

    The DuckDB oracle runs the same search as a recursive CTE over
    (node, depth) pairs — UNION (not UNION ALL) dedups pairs so cycles
    terminate — and takes MIN(d) per node, checking the frontier loop
    against a fixpoint formulation rather than a re-implementation of
    the iteration schedule. All-integer emissions."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").between("1995-01-01", "1995-12-31"))
        .select("o_orderkey")
    )
    li = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
    e = (
        a.join(b, "k")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    # both directions, materialized once: every round joins this table
    ed = tracked_local_checkpoint(
        e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    )
    # one scalar to the driver: the source vertex id (bounded, like the
    # corpus-total scalars elsewhere in the repo)
    source = ed.agg(F.min("u")).collect()[0][0]
    frontier = tracked_local_checkpoint(
        spark.createDataFrame([(int(source), 0)], "n: long, hop: int")
    )
    visited = frontier
    for hop in range(1, _BFS_CAP + 1):
        nxt = tracked_local_checkpoint(
            frontier.join(ed, frontier.n == ed.u)
            .select(F.col("v").alias("n"))
            .distinct()
            .join(visited, "n", "left_anti")
            .withColumn("hop", F.lit(hop))
        )
        if nxt.isEmpty():
            # the empty frontier is dead on arrival; the loop state the
            # return needs (visited) is already materialized
            release_checkpoint(nxt)
            break
        new_visited = tracked_local_checkpoint(visited.unionAll(nxt))
        # superseded-state release (ckpt.py): old visited is subsumed
        # by the materialized union; the old frontier was consumed by
        # both nxt and the union. Round 1's frontier IS visited —
        # release once, not twice.
        release_checkpoint(visited)
        if frontier is not visited:
            release_checkpoint(frontier)
        visited = new_visited
        frontier = nxt
    # edges are loop-only state; the final frontier (if the cap ended
    # the loop) is part of visited already
    release_checkpoint(ed)
    if frontier is not visited:
        release_checkpoint(frontier)
    return visited.select(
        F.col("n").alias("part"), F.col("hop").cast("long").alias("hop")
    ).orderBy("part")


_CC_CAP = 20

# January-1995 co-purchase subgraph: sparser than the full-1995 graph
# (which is one giant component at both fixture scales), so connected
# components are NON-VACUOUS — measured 59 components / 619 parts at
# sf0.01, 560 / 6,111 at sf0.1.
_JAN_EDGES_SQL = """
    li AS (
        SELECT l.l_orderkey, l.l_partkey
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-01-31'
    ),
    e AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM li a
        JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    ed AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e)
"""


def _jan_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected Jan-1995 co-purchase edges, both directions."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").between("1995-01-01", "1995-01-31"))
        .select("o_orderkey")
    )
    li = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
    e = (
        a.join(b, "k")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    return e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


@register(
    "q_graph_cc",
    oracle=f"""
    WITH RECURSIVE {_JAN_EDGES_SQL},
    nodes AS (SELECT DISTINCT u AS n FROM ed),
    r AS (
        SELECT n, n AS m FROM nodes
        UNION
        SELECT r.n, ed.v FROM r JOIN ed ON r.m = ed.u
    ),
    cc AS (SELECT n, MIN(m) AS comp FROM r GROUP BY n)
    SELECT c.n AS part,
           CAST(c.comp AS BIGINT) AS component,
           CAST(s.sz AS BIGINT) AS comp_size
    FROM cc c
    JOIN (SELECT comp, COUNT(*) AS sz FROM cc GROUP BY comp) s USING (comp)
    ORDER BY part
    """,
)
def q_graph_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONNECTED COMPONENTS on the January-1995 part co-purchase graph
    via min-label propagation with POINTER JUMPING — the missing member
    of the graph triad (pagerank = dense fixpoint, BFS = frontier
    expansion, CC = label fixpoint with path shortcutting). Plain
    hash-to-min needs diameter rounds (measured 14 / 28 at sf0.01 /
    sf0.1); interleaving a pointer-jump step (lbl <- lbl[lbl], the
    shortcutting that powers Kiveris et al. 2014's large-star /
    small-star and classic PRAM CC) flattens label chains
    geometrically, so the loop converges in O(log diameter) rounds —
    the difference between 28 and ~6 shuffle rounds at 100 TB. Each
    round is two key-partitioned hash joins (neighbor-min, then jump);
    convergence is detected by the monotone label-sum scalar (labels
    only ever decrease, so an unchanged SUM(lbl) IS a fixpoint — one
    cheap agg action per round, no changed-row join). localCheckpoint
    per round truncates the iterative lineage. At the steps-1-2
    fixpoint every edge (u,v) has lbl(u) = lbl(v), and since labels are
    only ever component-member minima the shared label is the component
    min — asserted against the oracle's transitive-closure formulation
    (recursive CTE reach-pairs, MIN per node), which checks the
    iteration against the DEFINITION rather than a re-implementation.
    All-integer emissions (part, component = min part id, comp_size)."""
    ed = tracked_local_checkpoint(_jan_edges(spark, sf_dir))
    lbl = tracked_local_checkpoint(
        ed.select(F.col("u").alias("node")).distinct().select(
            "node", F.col("node").alias("lbl")
        )
    )
    prev_sum = None
    for _ in range(_CC_CAP):
        nbr = (
            ed.join(lbl, ed.v == lbl.node)
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("lbl").alias("nmin"))
        )
        stepped = (
            lbl.join(nbr, "node", "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce("nmin", "lbl")).alias("lbl"),
            )
        )
        jt = stepped.select(
            F.col("node").alias("jn"), F.col("lbl").alias("jl")
        )
        new_lbl = tracked_local_checkpoint(
            stepped.join(jt, stepped.lbl == jt.jn, "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce("jl", "lbl")).alias("lbl"),
            )
        )
        # superseded-state release (ckpt.py): the new iterate is fully
        # materialized, the old label set is provably dead
        release_checkpoint(lbl)
        lbl = new_lbl
        cur = lbl.agg(F.sum("lbl")).collect()[0][0]
        if cur == prev_sum:
            break
        prev_sum = cur
    else:
        raise RuntimeError(f"q_graph_cc: no fixpoint within {_CC_CAP} rounds")
    # the edge table is loop-only state: the returned plan reads lbl only
    release_checkpoint(ed)
    sizes = lbl.groupBy(F.col("lbl").alias("component")).agg(
        F.count(F.lit(1)).alias("comp_size")
    )
    return (
        lbl.select(F.col("node").alias("part"), F.col("lbl").alias("component"))
        .join(sizes, "component")
        .select("part", "component", "comp_size")
        .orderBy("part")
    )


@register(
    "q_graph_common_neighbors",
    oracle=f"""
    WITH {_JAN_EDGES_SQL},
    deg AS (SELECT u, COUNT(*) AS d FROM ed GROUP BY u),
    wedge AS (
        SELECT a.v AS u, b.v AS v, a.u AS w
        FROM ed a JOIN ed b ON a.u = b.u AND a.v < b.v
    ),
    cand AS (
        SELECT wg.u, wg.v, wg.w FROM wedge wg
        WHERE NOT EXISTS (
            SELECT 1 FROM e WHERE e.u = wg.u AND e.v = wg.v
        )
    )
    SELECT c.u AS part_a, c.v AS part_b,
           CAST(COUNT(*) AS BIGINT) AS common_neighbors,
           CAST(SUM(1000000 // d.d) AS BIGINT) AS ra_micro
    FROM cand c JOIN deg d ON c.w = d.u
    GROUP BY c.u, c.v
    ORDER BY common_neighbors DESC, ra_micro DESC, part_a, part_b
    LIMIT 20
    """,
)
def q_graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINK PREDICTION on the January-1995 co-purchase graph: top-20
    non-adjacent part pairs by common-neighbor count, tie-broken by the
    RESOURCE-ALLOCATION index (Zhou et al. 2009) — the third one-round
    graph analytic after triangles (closed wedges) and CC: here the
    OPEN wedges are the signal. Wedges are enumerated by the same
    center-keyed self-join as q_graph_triangles (sum-of-degrees-squared
    work, measured 22k wedges at sf0.01 — bounded because the Jan
    co-purchase graph's max degree is 21); existing edges are removed
    with a LEFT ANTI hash join (never a NOT-EXISTS nested loop), and
    the RA score sums 1e6 DIV deg(w) over shared neighbors — integer
    division on both engines, so the score is exact and hash-portable
    where the classical Adamic-Adar 1/ln(deg) would hit the
    cross-engine log divergence documented in FIXTURES.md. The final
    top-20 is a TakeOrdered over the aggregated pair list, total-ordered
    by (cn, ra, pair) so ties are deterministic. At 100x scale the hot
    path is the wedge explosion: it is bounded by the degree cap the
    skew profiler (q_profile_skew) measures, and a production run would
    apply the same degree-threshold split GraphFrames uses — here the
    max degree makes the plain self-join the right plan."""
    ed = _jan_edges(spark, sf_dir)
    e = ed.filter(F.col("u") < F.col("v"))
    deg = ed.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    a = ed.select(F.col("u").alias("w"), F.col("v").alias("pa"))
    b = ed.select(F.col("u").alias("w2"), F.col("v").alias("pb"))
    wedge = a.join(b, (a.w == b.w2) & (a.pa < b.pb)).select(
        "pa", "pb", "w"
    )
    cand = wedge.join(
        e.select(F.col("u").alias("pa"), F.col("v").alias("pb")),
        ["pa", "pb"],
        "left_anti",
    )
    scored = (
        cand.join(deg, cand.w == deg.u)
        .groupBy("pa", "pb")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum(F.expr("1000000 DIV d")).alias("ra_micro"),
        )
    )
    return (
        scored.select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            "common_neighbors",
            "ra_micro",
        )
        .orderBy(
            F.desc("common_neighbors"), F.desc("ra_micro"), "part_a", "part_b"
        )
        .limit(20)
    )


_KCORE_K = 5
_KCORE_CAP = 20
# Parallel peeling converges in 2 rounds at sf0.01 and 3 at sf0.1
# (measured); the oracle unrolls 8 steps — a peel step at the fixpoint
# is the identity, so over-unrolling is harmless, while the Spark loop
# below detects the fixpoint dynamically and stays scale-robust.
# Every oracle CTE is MATERIALIZED: each step references its
# predecessor twice (u IN ... AND v IN ...), so DuckDB's default CTE
# inlining would re-evaluate the whole chain 2^8 times — including the
# quadratic co-purchase self-join (measured: hangs; materialized the
# full unroll runs in 0.1 s at sf0.1).
_KCORE_EDGES_SQL = """
    li AS MATERIALIZED (
        SELECT l.l_orderkey, l.l_partkey
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-01-31'
    ),
    e AS MATERIALIZED (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM li a
        JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    ed AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v, u FROM e)
"""
_KCORE_STEP = """
    d{i} AS MATERIALIZED (
        SELECT ed.u, COUNT(*) AS d
        FROM ed
        WHERE ed.u IN (SELECT n FROM s{i}) AND ed.v IN (SELECT n FROM s{i})
        GROUP BY ed.u
    ),
    s{next} AS MATERIALIZED (SELECT u AS n FROM d{i} WHERE d >= {k})"""


@register(
    "q_graph_kcore",
    oracle=f"""
    WITH {_KCORE_EDGES_SQL},
    s0 AS MATERIALIZED (SELECT DISTINCT u AS n FROM ed),
    {",".join(_KCORE_STEP.format(i=i, next=i + 1, k=_KCORE_K).lstrip() for i in range(8))},
    core AS (
        SELECT ed.u, COUNT(*) AS core_degree
        FROM ed
        WHERE ed.u IN (SELECT n FROM s8) AND ed.v IN (SELECT n FROM s8)
        GROUP BY ed.u
    )
    SELECT c.u AS part, CAST(c.core_degree AS BIGINT) AS core_degree,
           CAST(g.d AS BIGINT) AS full_degree
    FROM core c
    JOIN (SELECT u, COUNT(*) AS d FROM ed GROUP BY u) g ON c.u = g.u
    ORDER BY part
    """,
)
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-CORE DECOMPOSITION (fixed k = 5) of the January-1995 part
    co-purchase graph by PARALLEL PEELING: every round simultaneously
    drops ALL vertices whose degree within the surviving subgraph is
    < k, then recomputes degrees — the bulk-synchronous formulation
    (Matula/Beck peeling batched per round) that maps one peel round to
    two semi-joins plus one key-partitioned count per iteration, instead
    of the sequential min-degree deletion a single-node implementation
    would use. Convergence is the monotone surviving-node COUNT (node
    sets only shrink, so an unchanged count IS the fixpoint — one cheap
    action per round); measured 2 / 3 rounds at sf0.01 / sf0.1, and the
    round count grows with graph diameter, not data volume, so the loop
    holds at 100 TB where each round is a shuffle keyed on the vertex
    id. localCheckpoint per round truncates iterative lineage. The
    5-core keeps 295 / 2,496 of 619 / 6,111 parts at sf0.01 / sf0.1 —
    non-vacuous at the driver's scale. Oracle: 8 unrolled peel-step CTEs
    (fixpoint-idempotent, so the fixed unroll is exact); emissions are
    all-integer (part, core_degree within the 5-core, full_degree).
    Reference analog: none — target-only capability (the reference's
    query surface is userdata/cloudinit.sh:346-351)."""
    ed = tracked_local_checkpoint(_jan_edges(spark, sf_dir))
    nodes = tracked_local_checkpoint(
        ed.select(F.col("u").alias("n")).distinct()
    )
    prev = nodes.count()
    for _ in range(_KCORE_CAP):
        e2 = ed.join(nodes, ed.u == nodes.n, "left_semi").join(
            nodes, ed.v == nodes.n, "left_semi"
        )
        deg = e2.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        new_nodes = tracked_local_checkpoint(
            deg.filter(F.col("d") >= _KCORE_K).select(F.col("u").alias("n"))
        )
        # superseded-state release (ckpt.py); ed stays — the returned
        # core_e/full_deg plans read it
        release_checkpoint(nodes)
        nodes = new_nodes
        cur = nodes.count()
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"q_graph_kcore: no fixpoint within {_KCORE_CAP}")
    core_e = ed.join(nodes, ed.u == nodes.n, "left_semi").join(
        nodes, ed.v == nodes.n, "left_semi"
    )
    core_deg = core_e.groupBy("u").agg(
        F.count(F.lit(1)).alias("core_degree")
    )
    full_deg = ed.groupBy("u").agg(F.count(F.lit(1)).alias("full_degree"))
    return (
        core_deg.join(full_deg, "u")
        .select(F.col("u").alias("part"), "core_degree", "full_degree")
        .orderBy("part")
    )


@register(
    "q_graph_assortativity",
    oracle="""
    WITH li AS MATERIALIZED (
        SELECT l.l_orderkey, l.l_partkey
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-01-31'
    ),
    e AS MATERIALIZED (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM li a
        JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    ed AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT u, COUNT(*) AS d FROM ed GROUP BY u),
    dd AS (
        SELECT du.d AS x, dv.d AS y
        FROM ed JOIN deg du ON ed.u = du.u JOIN deg dv ON ed.v = dv.u
    ),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM dd
    )
    SELECT CAST(n AS BIGINT) AS n_directed_edges,
           CAST(ROUND(1000000.0 * (
               CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
           ) / (
               SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
           ), 0) AS BIGINT) AS assortativity_micro
    FROM s
    """,
)
def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEGREE ASSORTATIVITY (Newman 2002) of the January-1995
    co-purchase graph: the Pearson correlation of (deg u, deg v) over
    directed edge endpoints — positive means hubs co-purchase with
    hubs (measured +0.34 here), the single scalar that tells a graph
    pipeline whether degree-based partitioning will skew. Dataflow:
    degree table (one keyed count), two shuffle joins to annotate each
    edge endpoint — at 100 TB these co-partition on the vertex id, so
    the second join reuses the first's exchange — then one
    map-side-combinable moment aggregation; degrees are small ints so
    the int64 moment sums hold far past this fixture. The Pearson
    ratio is the q_ts_autocorr identical-IEEE-expression idiom over
    exact int64 scalars, emitted as scale-0-rounded micro-units.
    Oracle CTEs are MATERIALIZED (q_graph_kcore lesson — the inlined
    quadratic edge join would re-evaluate per reference). Reference
    analog: none — target-only capability."""
    ed = _jan_edges(spark, sf_dir).localCheckpoint()
    deg = ed.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    du = deg.select(F.col("u").alias("nu"), F.col("d").alias("x"))
    dv = deg.select(F.col("u").alias("nv"), F.col("d").alias("y"))
    dd = ed.join(du, ed.u == du.nu).join(dv, ed.v == dv.nv)
    s = dd.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )

    def d(c: str):
        return F.col(c).cast("double")

    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(d("n") * d("sxx") - d("sx") * d("sx")) * F.sqrt(
        d("n") * d("syy") - d("sy") * d("sy")
    )
    return s.select(
        F.col("n").alias("n_directed_edges"),
        F.round(F.lit(1000000.0) * num / den, 0)
        .cast("long")
        .alias("assortativity_micro"),
    )


_SSSP_HOPS = 4
_SSSP_INF = 9223372036854775807
_SSSP_STEP = """
    c{n} AS MATERIALIZED (
        SELECT we.v AS node, MIN(r.dist + we.w) AS cand
        FROM r{i} r JOIN we ON r.node = we.u GROUP BY we.v
    ),
    r{n} AS MATERIALIZED (
        SELECT COALESCE(r.node, c.node) AS node,
               LEAST(COALESCE(r.dist, 9223372036854775807),
                     COALESCE(c.cand, 9223372036854775807)) AS dist
        FROM r{i} r FULL JOIN c{n} c ON r.node = c.node
    )"""


@register(
    "q_graph_sssp",
    oracle=f"""
    WITH li AS MATERIALIZED (
        SELECT l.l_orderkey, l.l_partkey
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-01-31'
    ),
    e AS MATERIALIZED (
        SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS cnt
        FROM li a
        JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    we AS MATERIALIZED (
        SELECT u, v, 1000000 // cnt AS w FROM e
        UNION ALL SELECT v, u, 1000000 // cnt FROM e
    ),
    deg AS (SELECT u, COUNT(*) AS d FROM we GROUP BY u),
    src AS (SELECT u AS s FROM deg ORDER BY d DESC, u LIMIT 1),
    r0 AS MATERIALIZED (
        SELECT (SELECT s FROM src) AS node, CAST(0 AS BIGINT) AS dist
    ),
    {",".join(_SSSP_STEP.format(i=i, n=i + 1).lstrip() for i in range(_SSSP_HOPS))}
    SELECT node AS part, dist AS dist_cost
    FROM r{_SSSP_HOPS} ORDER BY part
    """,
)
def q_graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUNDED-HOP WEIGHTED SHORTEST PATHS (4 Bellman-Ford relaxation
    rounds) on the January-1995 co-purchase graph from its highest-
    degree part: edge cost = 1000000 DIV co-purchase-count (frequent
    co-purchases are 'close' — integer costs, hash-portable), each
    round one min-plus join (current distances x edges, keyed on the
    source endpoint) + one full outer merge with LEAST — the classic
    iterative-relaxation dataflow whose per-round cost is a single
    vertex-keyed shuffle at any scale. The HOP BOUND is the semantic,
    not a convergence shortcut: both engines run exactly 4 rounds, so
    the result is the 4-hop distance ball (187 parts at sf0.01) —
    the bounded-reach query a recommender actually asks ('parts within
    4 co-purchase hops'), and the fixed unroll keeps the oracle exact
    (q_graph_cc/kcore cover the run-to-fixpoint pattern; oracle CTEs
    MATERIALIZED per the kcore lesson). localCheckpoint per round
    truncates lineage. All-integer emissions. Reference analog: none —
    target-only capability."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").between("1995-01-01", "1995-01-31"))
        .select("o_orderkey")
    )
    li = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
    e = (
        a.join(b, "k")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = F.expr("1000000 DIV cnt")
    we = tracked_local_checkpoint(
        e.select("u", "v", w.alias("w")).unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"), w.alias("w"))
        )
    )
    src = (
        we.groupBy("u")
        .agg(F.count(F.lit(1)).alias("d"))
        .orderBy(F.desc("d"), "u")
        .limit(1)
        .collect()[0][0]
    )
    r = spark.createDataFrame([(src, 0)], "node long, dist long")
    for _ in range(_SSSP_HOPS):
        cand = (
            r.join(we, r.node == we.u)
            .groupBy(F.col("v").alias("cnode"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("cand"))
        )
        new_r = tracked_local_checkpoint(
            r.join(cand, r.node == cand.cnode, "full")
            .select(
                F.coalesce("node", "cnode").alias("node"),
                F.least(
                    F.coalesce("dist", F.lit(_SSSP_INF)),
                    F.coalesce("cand", F.lit(_SSSP_INF)),
                ).alias("dist"),
            )
        )
        # superseded-state release (ckpt.py); round 0's r is an
        # untracked in-memory literal — release_checkpoint no-ops
        release_checkpoint(r)
        r = new_r
    # the weighted edge table is loop-only state
    release_checkpoint(we)
    return r.select(F.col("node").alias("part"), F.col("dist").alias("dist_cost")).orderBy("part")


@register(
    "q_graph_modularity",
    oracle="""
    WITH li AS MATERIALIZED (
        SELECT l.l_orderkey, l.l_partkey
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-01-31'
    ),
    e AS MATERIALIZED (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM li a
        JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    lbl AS (SELECT p_partkey, p_brand FROM part),
    mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
    intra AS (
        SELECT pu.p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS ec
        FROM e
        JOIN lbl pu ON e.u = pu.p_partkey
        JOIN lbl pv ON e.v = pv.p_partkey
        WHERE pu.p_brand = pv.p_brand GROUP BY 1
    ),
    deg AS (
        SELECT lbl.p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS dc
        FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e) nd
        JOIN lbl ON nd.n = lbl.p_partkey GROUP BY 1
    )
    SELECT d.brand,
           COALESCE(i.ec, 0) AS intra_edges,
           d.dc AS degree_sum,
           CAST(ROUND(1000000.0 *
               (4.0 * CAST((SELECT m FROM mm) AS DOUBLE)
                    * CAST(COALESCE(i.ec, 0) AS DOUBLE)
                - CAST(d.dc AS DOUBLE) * CAST(d.dc AS DOUBLE))
               / (4.0 * CAST((SELECT m FROM mm) AS DOUBLE)
                      * CAST((SELECT m FROM mm) AS DOUBLE)), 0)
               AS BIGINT) AS contrib_micro
    FROM deg d LEFT JOIN intra i ON d.brand = i.brand
    ORDER BY d.brand
    """,
)
def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEWMAN MODULARITY of the BRAND partition over the January-1995
    co-purchase graph — the partition-quality audit run before trusting
    any community assignment: per brand c, the contribution
    (e_c/m) - (d_c/2m)^2, where e_c = intra-brand edges and d_c = the
    brand's degree sum. The fixture answer is honestly NEGATIVE
    (~-0.003 summed): same-brand parts co-purchase LESS than the
    configuration-model baseline — brands are assigned independently of
    baskets, and the operator proves it quantitatively. Exact counts
    (m, e_c, d_c) come from three hash aggregations over the edge
    table (intra test = one extra equi-join on the vertex label); the
    per-brand ratio is ONE identical IEEE expression over those exact
    int64 scalars emitted as scale-0 micro-units — chosen over integer
    cross-multiplication because (4*m*e_c - d_c^2) * 1e6 overflows
    int64 past ~1.5M edges, while the double ratio is scale-unbounded
    and still bit-portable (the q_ts_autocorr idiom; div/mul/round all
    correctly rounded). Oracle CTEs MATERIALIZED per the kcore lesson.
    Reference analog: none — target-only capability."""
    e = (
        _jan_edges(spark, sf_dir)
        .filter(F.col("u") < F.col("v"))
        .localCheckpoint()
    )
    part = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"), F.col("p_brand").alias("brand")
    )
    m = e.count()
    lu = part.select(F.col("pk").alias("u"), F.col("brand").alias("bu"))
    lv = part.select(F.col("pk").alias("v"), F.col("brand").alias("bv"))
    intra = (
        e.join(lu, "u").join(lv, "v")
        .filter(F.col("bu") == F.col("bv"))
        .groupBy(F.col("bu").alias("brand"))
        .agg(F.count(F.lit(1)).alias("ec"))
    )
    nodes = e.select(F.col("u").alias("n")).unionAll(
        e.select(F.col("v").alias("n"))
    )
    deg = (
        nodes.join(part, nodes.n == part.pk)
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("dc"))
    )
    md = float(m)
    contrib = (
        F.lit(4.0) * F.lit(md) * F.coalesce("ec", F.lit(0)).cast("double")
        - F.col("dc").cast("double") * F.col("dc").cast("double")
    ) / (F.lit(4.0) * F.lit(md) * F.lit(md))
    return (
        deg.join(intra, "brand", "left")
        .select(
            "brand",
            F.coalesce("ec", F.lit(0)).alias("intra_edges"),
            F.col("dc").alias("degree_sum"),
            F.round(F.lit(1000000.0) * contrib, 0)
            .cast("long")
            .alias("contrib_micro"),
        )
        .orderBy("brand")
    )


@register(
    "q_graph_2hop_reach",
    oracle=f"""
    WITH RECURSIVE {_JAN_EDGES_SQL},
    edm AS MATERIALIZED (SELECT u, v FROM ed),
    two AS MATERIALIZED (
        SELECT DISTINCT a.u, b.v AS w
        FROM edm a JOIN edm b ON a.v = b.u
        WHERE b.v <> a.u
    ),
    fresh AS (
        SELECT t.u, t.w FROM two t
        LEFT JOIN edm d ON t.u = d.u AND t.w = d.v
        WHERE d.u IS NULL
    )
    SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS reach2
    FROM fresh GROUP BY u
    ORDER BY node
    """,
)
def q_graph_2hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-HOP REACH (friends-of-friends count) on the January-1995
    co-purchase graph: for each part, how many NEW parts become
    reachable at exactly distance 2 — the neighborhood-growth metric
    behind recommendation candidate pools and graph-sampling fanout
    budgets. Dataflow: one self-join of the deduped directed edge list
    on the middle vertex (the standard triangle/path-counting shuffle,
    keyed on vertex id so it co-partitions with the degree ops), DISTINCT
    to collapse multi-path pairs, then an ANTI-JOIN against the edge
    list to drop distance-1 pairs and the self pair — exactly the
    candidate-minus-known shape dedup pipelines use. All integers.
    Oracle CTEs are MATERIALIZED (q_graph_kcore lesson: DuckDB inlines
    twice-referenced CTEs and re-evaluates the quadratic join).
    Reference analog: none — target-only capability."""
    ed = _jan_edges(spark, sf_dir).localCheckpoint()
    a = ed.select(F.col("u").alias("src"), F.col("v").alias("mid"))
    b = ed.select(F.col("u").alias("mid"), F.col("v").alias("w"))
    two = (
        a.join(b, "mid")
        .filter(F.col("w") != F.col("src"))
        .select(F.col("src").alias("u"), "w")
        .distinct()
    )
    fresh = two.join(
        ed.select("u", F.col("v").alias("w")), ["u", "w"], "left_anti"
    )
    return (
        fresh.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).alias("reach2"))
        .orderBy("node")
    )


@register(
    "q_graph_degree_powerlaw",
    oracle=f"""
    WITH RECURSIVE {_JAN_EDGES_SQL},
    deg AS (
        SELECT u, CAST(COUNT(*) AS BIGINT) AS k FROM ed GROUP BY u
    ),
    dist AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS cnt FROM deg GROUP BY k
    ),
    pts AS (
        SELECT CAST(ROUND(1000000.0 * LN(CAST(k AS DOUBLE))) AS BIGINT)
                   AS x,
               CAST(ROUND(1000000.0 * LN(CAST(cnt AS DOUBLE))) AS BIGINT)
                   AS y
        FROM dist
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM pts
    )
    SELECT n AS n_degree_levels,
           CAST(ROUND(1000000.0 * (
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           ), 0) AS BIGINT) AS slope_micro
    FROM s
    """,
)
def q_graph_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEGREE-DISTRIBUTION POWER-LAW FIT — the log-log regression slope
    of (degree, frequency), the one-scalar answer to "is this graph
    scale-free enough that degree-hash partitioning will hotspot?"
    (slope ~ -alpha; heavier tails = more negative). The log points use
    the HOUSE LOG-TERM RULE (q_rank_ndcg precedent): ln is NOT
    bit-portable across libm implementations, so each coordinate is
    micro-rounded ONCE — the ~1-ulp noise is ~8 orders below the
    quantum — and every moment after that is exact int64 (x,y ~ 1e7
    micro-units, SUM(x*y) ~ 1e15 per level: int64-safe to millions of
    degree levels). The slope is one IEEE expression over those exact
    moments (the q_agg_regr idiom). Dataflow: degree count -> degree
    histogram -> constant-size regression: two chained hash aggregates,
    output scales with DISTINCT DEGREES, not vertices. Reference
    analog: none — target-only capability."""
    ed = _jan_edges(spark, sf_dir)
    deg = ed.groupBy("u").agg(F.count(F.lit(1)).alias("k"))
    dist = deg.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
    pts = dist.select(
        F.round(F.lit(1000000.0) * F.log(F.col("k").cast("double")))
        .cast("long")
        .alias("x"),
        F.round(F.lit(1000000.0) * F.log(F.col("cnt").cast("double")))
        .cast("long")
        .alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )

    def d(c: str):
        return F.col(c).cast("double")

    slope = (d("n") * d("sxy") - d("sx") * d("sy")) / (
        d("n") * d("sxx") - d("sx") * d("sx")
    )
    return s.select(
        F.col("n").alias("n_degree_levels"),
        F.round(F.lit(1000000.0) * slope, 0).cast("long").alias("slope_micro"),
    )


@register(
    "q_graph_neighbor_sample",
    oracle=f"""
    WITH RECURSIVE {_JAN_EDGES_SQL},
    ranked AS (
        SELECT u, v,
               ROW_NUMBER() OVER (
                   PARTITION BY u
                   ORDER BY ('0x' || SUBSTRING(MD5('nbr' ||
                             CAST(u AS VARCHAR) || '_' ||
                             CAST(v AS VARCHAR)), 1, 8))::UBIGINT, v
               ) AS rnk
        FROM ed
    )
    SELECT u, v, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY u, rnk
    """,
)
def q_graph_neighbor_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC NEIGHBOR SAMPLING (GraphSAGE-style fanout cap):
    every vertex keeps at most 3 neighbors, chosen by md5-prefix hash
    rank over the edge — the fanout bound that makes multi-hop GNN
    feature aggregation tractable on power-law graphs (hubs with 10^6
    neighbors would otherwise dominate every batch). Hash-lottery
    selection (seeded 'nbr', edge-keyed) reproduces identically across
    cluster topologies and reruns — the property torch-style random
    samplers lose on retry — and the per-vertex rank window is
    Catalyst's WindowGroupLimit shape: the rnk <= 3 predicate prunes
    inside the sort, so no vertex ever materializes its full
    neighborhood post-shuffle. Emits (vertex, sampled neighbor, rank).
    Reference analog: none — target-only capability."""
    from pyspark.sql.window import Window

    ed = _jan_edges(spark, sf_dir)
    h = F.expr(
        "CAST(conv(substring(md5(concat('nbr', CAST(u AS STRING), '_',"
        " CAST(v AS STRING))), 1, 8), 16, 10) AS BIGINT)"
    )
    w = Window.partitionBy("u").orderBy(h, "v")
    return (
        ed.select("u", "v", F.row_number().over(w).cast("long").alias("rnk"))
        .filter(F.col("rnk") <= 3)
        .orderBy("u", "rnk")
    )
