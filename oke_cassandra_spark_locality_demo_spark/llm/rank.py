"""Retrieval ranking beyond BM25: Dirichlet query-likelihood and
reciprocal-rank fusion.

A curation pipeline rarely trusts one retrieval scorer: eval-set mining
and quality classification typically fuse a lexical ranker with a second
signal (Cormack et al. 2009, "Reciprocal Rank Fusion outperforms Condorcet
and individual rank learning methods"). These ops add the second lexical
family (query-likelihood language modeling, Zhai & Lafferty 2001) and the
fusion step over the repo's existing BM25 ranking. The reference executes
no retrieval workload (SURVEY.md Appendix A); these extend the
training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import get, register
from .text import BM25_QUERY, _words, q_text_bm25

#: Dirichlet smoothing pseudo-count (Zhai & Lafferty's recommended
#: magnitude). Appears as the LITERAL 2000.0 in both the Spark
#: expression and the oracle SQL — the two texts must stay
#: digit-identical for bit parity (same rule as BM25's k1/b literals).
_MU = 2000.0

_QL_ORACLE = """
    WITH tok AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(LOWER(text)), ' ')) AS word
        FROM documents
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
    g AS (SELECT CAST(SUM(dl) AS BIGINT) AS ctot FROM dl),
    cf AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cf
        FROM tok WHERE word IN ('spark', 'join', 'window')
        GROUP BY word
    ),
    tf AS (
        SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok WHERE word IN ('spark', 'join', 'window')
        GROUP BY doc_id, word
    ),
    base AS (SELECT dl.doc_id, dl.dl, cf.word, cf.cf FROM dl CROSS JOIN cf),
    j AS (
        SELECT base.doc_id, base.dl, base.cf, COALESCE(tf.tf, 0) AS tf0
        FROM base
        LEFT JOIN tf ON base.doc_id = tf.doc_id AND base.word = tf.word
    ),
    scored AS (
        SELECT doc_id,
               CAST(ROUND(LN((tf0 + 2000.0 * (CAST(cf AS DOUBLE) / ctot))
                             / (dl + 2000.0)) * 1000000.0)
                    AS BIGINT) AS term_u
        FROM j CROSS JOIN g
    )
    SELECT doc_id, CAST(SUM(term_u) AS BIGINT) AS ql_e6
    FROM scored GROUP BY doc_id
    ORDER BY ql_e6 DESC, doc_id LIMIT 20
    """


@register("q_text_ql", oracle=_QL_ORACLE)
def q_text_ql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed QUERY-LIKELIHOOD top-20 ranking of `documents`
    for the same fixed probe as `q_text_bm25` — the language-modeling
    retrieval family (score = Σ_w ln p(w|doc), p Dirichlet-smoothed
    toward the collection model), the standard second lexical scorer a
    pipeline fuses with BM25.

    Unlike BM25, QL scores ALL probe terms per doc (absent terms
    contribute the smoothed background mass), so the per-doc work is a
    docs × |probe| cross join against a |probe|-row broadcast — 3 extra
    rows per doc, not a vocabulary join. Collection stats (ctot, per-term
    cf) are 1-row / |probe|-row broadcasts; tf and dl are map-side
    combinable aggregates of one explode; top-20 is a TakeOrdered.

    Float discipline (same as BM25): the smoothed probability is a chain
    of identically-written IEEE ops on integer-derived operands —
    bit-identical on both engines — and the single non-portable step
    (LN, 1-ulp across libm/fdlibm) is rounded ONCE per term to integer
    micro-units, then summed exactly as BIGINT. Ranking and tie-break
    are integer-deterministic."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_words(F.col("text"))).alias("word"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    g = dl.agg(F.sum("dl").alias("ctot"))
    cf = (
        tok.filter(F.col("word").isin(BM25_QUERY))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cf"))
    )
    tf = (
        tok.filter(F.col("word").isin(BM25_QUERY))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    base = dl.crossJoin(F.broadcast(cf))
    j = base.join(tf, ["doc_id", "word"], "left").select(
        "doc_id", "dl", "cf", F.coalesce(F.col("tf"), F.lit(0)).alias("tf0")
    )
    scored = j.crossJoin(F.broadcast(g)).select(
        "doc_id",
        F.round(
            F.log(
                (F.col("tf0") + 2000.0 * (F.col("cf").cast("double") / F.col("ctot")))
                / (F.col("dl") + 2000.0)
            )
            * 1000000.0,
            0,
        )
        .cast("long")
        .alias("term_u"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("term_u").alias("ql_e6"))
        .orderBy(F.col("ql_e6").desc(), "doc_id")
        .limit(20)
    )


@register(
    "q_rank_rrf",
    oracle=f"""
    WITH bm AS ({get("q_text_bm25").oracle}),
    ql AS ({_QL_ORACLE}),
    br AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bm25_e6 DESC, doc_id) AS ra
        FROM bm
    ),
    qr AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY ql_e6 DESC, doc_id) AS rb
        FROM ql
    ),
    f AS (
        SELECT COALESCE(br.doc_id, qr.doc_id) AS doc_id,
               COALESCE(ra, 0) AS ra, COALESCE(rb, 0) AS rb
        FROM br FULL OUTER JOIN qr ON br.doc_id = qr.doc_id
    )
    SELECT doc_id, CAST(ra AS BIGINT) AS rank_bm25,
           CAST(rb AS BIGINT) AS rank_ql,
           CAST(ROUND((CASE WHEN ra > 0 THEN 1.0 / (60.0 + ra) ELSE 0.0 END
                     + CASE WHEN rb > 0 THEN 1.0 / (60.0 + rb) ELSE 0.0 END)
                      * 1000000.0) AS BIGINT) AS rrf_e6
    FROM f ORDER BY rrf_e6 DESC, doc_id
    """,
)
def q_rank_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECIPROCAL-RANK FUSION of the BM25 and query-likelihood top-20
    lists (Cormack et al. 2009): score(d) = Σ_r 1/(k + rank_r(d)) with
    the canonical k = 60; a doc absent from one list contributes 0 from
    it (rank emitted as 0). RRF is how hybrid-retrieval pipelines merge
    incomparable scorers — ranks are fused, never raw scores, so no
    cross-scorer calibration is needed.

    The rank windows run over the two TOP-20 lists — 20-row constant
    inputs, so the unpartitioned `row_number` is bounded by construction
    (the upstream rankers already did their TakeOrdered reduction at
    scale; fusion cost is independent of corpus size). The fused score
    is a per-row IEEE chain on two small integers, written
    digit-identically on both engines (two correctly-rounded divisions,
    one addition, one exact scaling) and rounded once at scale 0 —
    portable; everything else is integer."""
    w = Window.orderBy(F.col("bm25_e6").desc(), "doc_id")
    br = (
        q_text_bm25(spark, sf_dir)
        .select("doc_id", F.row_number().over(w).alias("ra"))
    )
    w2 = Window.orderBy(F.col("ql_e6").desc(), "doc_id")
    qr = (
        q_text_ql(spark, sf_dir)
        .select("doc_id", F.row_number().over(w2).alias("rb"))
    )
    f = (
        br.join(qr, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce(F.col("ra"), F.lit(0)).alias("ra"),
            F.coalesce(F.col("rb"), F.lit(0)).alias("rb"),
        )
    )
    contrib_a = F.when(
        F.col("ra") > 0, F.lit(1.0) / (F.lit(60.0) + F.col("ra"))
    ).otherwise(F.lit(0.0))
    contrib_b = F.when(
        F.col("rb") > 0, F.lit(1.0) / (F.lit(60.0) + F.col("rb"))
    ).otherwise(F.lit(0.0))
    return f.select(
        "doc_id",
        F.col("ra").cast("long").alias("rank_bm25"),
        F.col("rb").cast("long").alias("rank_ql"),
        F.round((contrib_a + contrib_b) * 1000000.0, 0)
        .cast("long")
        .alias("rrf_e6"),
    ).orderBy(F.col("rrf_e6").desc(), "doc_id")


PHRASE = ("hash", "value")


@register(
    "q_text_phrase_search",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS a FROM documents
    ),
    m AS (
        SELECT doc_id,
               list_filter(range(1, len(a) + 1),
                           i -> a[i] = '{PHRASE[0]}'
                                AND COALESCE(a[i + 1] = '{PHRASE[1]}',
                                             FALSE)) AS hits
        FROM t
    )
    SELECT doc_id,
           CAST(len(hits) AS BIGINT) AS n_matches,
           CAST(hits[1] AS BIGINT) AS first_pos
    FROM m WHERE len(hits) > 0
    ORDER BY doc_id
    """,
)
def q_text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PHRASE SEARCH ("{hash value}") over `documents` — the
    positional-match retrieval primitive BM25/QL bag-of-words ranking
    cannot express (term adjacency matters). Implemented as a
    HIGHER-ORDER-FUNCTION scan: split once, then a vectorized
    transform/filter pass emits the 1-based start positions where
    token i = 'hash' and token i+1 = 'value' — `try_element_at` keeps
    the boundary lookup NULL-safe under ANSI mode. The whole match is
    a narrow projection inside whole-stage codegen: ZERO exchanges,
    no explode row blow-up, no (doc_id, pos) self-join — at 100 TB
    this is a pure map-side scan that parallelizes per input split,
    versus the classical positional-postings join (posexplode ->
    filter terms -> join on doc_id, pos+1) whose shuffle grows with
    corpus token count, not match count. (The postings formulation is
    the right shape only when an inverted INDEX is materialized once
    and probed by many queries; for one-shot scans the HOF plan
    strictly dominates.) The oracle mirrors it with DuckDB's
    list_filter over a 1-based range, COALESCE guarding the same
    boundary. All-integer emissions (doc_id, n_matches, first_pos);
    measured non-vacuous at every fixture scale (31 matching docs at
    sf0.01)."""
    d = load(spark, sf_dir, "documents")
    hits = F.expr(
        f"""filter(
              transform(split(text, ' '),
                        (x, i) -> IF(x = '{PHRASE[0]}'
                                     AND try_element_at(split(text, ' '),
                                                        i + 2)
                                         = '{PHRASE[1]}',
                                     i + 1, -1)),
              p -> p > 0)"""
    )
    return (
        d.select("doc_id", hits.alias("hits"))
        .filter(F.size("hits") > 0)
        .select(
            "doc_id",
            F.size("hits").cast("long").alias("n_matches"),
            F.element_at("hits", 1).cast("long").alias("first_pos"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_rank_eval",
    oracle=f"""
    WITH bm AS ({get("q_text_bm25").oracle}),
    ranked AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bm25_e6 DESC, doc_id) AS rnk
        FROM bm
    ),
    tok AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(LOWER(text)), ' ')) AS word
        FROM documents
    ),
    tcnt AS (
        SELECT doc_id, word, COUNT(*) AS c
        FROM tok WHERE word IN ('spark', 'join', 'window')
        GROUP BY doc_id, word
    ),
    rel AS (
        SELECT doc_id FROM tcnt WHERE c >= 3
        GROUP BY doc_id HAVING COUNT(*) = 3
    ),
    nrel AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rel FROM rel),
    j AS (SELECT r.rnk FROM ranked r JOIN rel ON r.doc_id = rel.doc_id)
    SELECT (SELECT n_rel FROM nrel) AS n_rel,
           CAST(COUNT(CASE WHEN rnk <= 5 THEN 1 END) AS BIGINT) AS hits5,
           CAST(COUNT(CASE WHEN rnk <= 10 THEN 1 END) AS BIGINT) AS hits10,
           CAST(COUNT(*) AS BIGINT) AS hits20,
           CAST(COUNT(CASE WHEN rnk <= 5 THEN 1 END) * 200000 AS BIGINT)
               AS p5_e6,
           CAST(COUNT(CASE WHEN rnk <= 10 THEN 1 END) * 100000 AS BIGINT)
               AS p10_e6,
           CAST(COUNT(*) * 1000000 // (SELECT n_rel FROM nrel) AS BIGINT)
               AS recall20_e6,
           CAST(COALESCE(1000000 // MIN(rnk), 0) AS BIGINT) AS mrr_e6
    FROM j
    """,
)
def q_rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRIEVAL EVALUATION of the BM25 ranker against a set-algebraic
    relevance truth (docs containing EVERY probe term at least 3 times —
    a conjunctive-frequency criterion strict enough that the top-20 is
    only partially relevant, so the metrics actually discriminate): precision@5/@10, recall@20, and MRR over the top-20 list.
    Every metric is EXACT integer arithmetic — precision@k is
    hits*1e6/k with k|1e6, recall and MRR use integer DIV — so the
    scorecard is hash-portable with no float canon at all (NDCG is
    deliberately absent: its log2 discount is the cross-engine
    divergence documented in FIXTURES.md; rank-reciprocal metrics
    carry the same signal exactly). Scale shape: the ranked list is a
    constant 20 rows (the upstream TakeOrdered already reduced it), so
    the rank window, the relevance join (broadcast by size), and the
    final single-row aggregate are all corpus-size-independent — the
    only corpus-scale work is the relevance scan, one token explode ->
    conjunctive groupBy, the same pruned shuffle BM25 itself does.
    Oracle: composed from the registered BM25 oracle CTE (the
    q_rank_rrf composition pattern), so both engines evaluate the SAME
    ranking they already cross-checked."""
    bm = q_text_bm25(spark, sf_dir)
    w = Window.orderBy(F.col("bm25_e6").desc(), "doc_id")
    ranked = bm.select("doc_id", F.row_number().over(w).alias("rnk"))
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_words(F.col("text"))).alias("word"))
    rel = (
        tok.filter(F.col("word").isin(BM25_QUERY))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 3)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nw"))
        .filter(F.col("nw") == len(BM25_QUERY))
        .select("doc_id")
    )
    nrel = rel.agg(F.count(F.lit(1)).cast("long").alias("n_rel"))
    j = ranked.join(rel, "doc_id")
    hits5 = F.count(F.when(F.col("rnk") <= 5, 1))
    hits10 = F.count(F.when(F.col("rnk") <= 10, 1))
    agg = j.agg(
        hits5.alias("hits5"),
        hits10.alias("hits10"),
        F.count(F.lit(1)).alias("hits20"),
        F.min("rnk").alias("minrnk"),
    )
    return (
        agg.crossJoin(F.broadcast(nrel))
        .select(
            "n_rel",
            "hits5",
            "hits10",
            "hits20",
            (F.col("hits5") * 200000).alias("p5_e6"),
            (F.col("hits10") * 100000).alias("p10_e6"),
            F.expr("hits20 * 1000000 DIV n_rel").alias("recall20_e6"),
            F.coalesce(
                F.expr("1000000 DIV minrnk"), F.lit(0).cast("long")
            ).alias("mrr_e6"),
        )
    )


@register(
    "q_rank_tau",
    oracle="""
    WITH m AS (
        SELECT l_partkey AS part,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                   AS BIGINT) AS rev_cents,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem GROUP BY 1
    ),
    top AS (
        SELECT part, rev_cents, qty,
               ROW_NUMBER() OVER (ORDER BY rev_cents DESC, part) AS ra,
               ROW_NUMBER() OVER (ORDER BY qty DESC, part) AS rb
        FROM m
        QUALIFY ROW_NUMBER() OVER (ORDER BY rev_cents DESC, part) <= 100
    ),
    pairs AS (
        SELECT CASE WHEN (a.ra - b.ra) * (a.rb - b.rb) > 0 THEN 1 ELSE 0 END AS conc
        FROM top a JOIN top b ON a.part < b.part
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(conc) AS BIGINT) AS concordant,
           CAST(COUNT(*) - SUM(conc) AS BIGINT) AS discordant,
           CAST((2 * SUM(conc) - COUNT(*)) * 1000000 // COUNT(*) AS BIGINT)
               AS tau_micro
    FROM pairs
    """,
)
def q_rank_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL TAU RANK CORRELATION between two rankings of the top-100
    parts — by revenue vs by shipped quantity — the ranker-agreement
    scalar every retrieval/recommendation eval reports next to P@k
    (q_rank_eval) and RRF fusion (q_rank_rrf). Exact-integer end to
    end: both metrics integerize per row before summing, both rankings
    are total orders (metric DESC, part id tiebreak — no tie terms, so
    tau-a is exact), the concordance test is the sign of the integer
    product (ra-rb cross-difference), and tau = (2C - P)/P emits in
    micro-units via integer division. Scale shape: ONE hash
    aggregation over the fact table builds the metric table; ranking
    and the P = C(100,2) = 4,950-pair self-join run on the top-100
    slice only — the pair space is bounded by the ranked-list length,
    never the corpus (the documented contract of list-level eval
    metrics). Reference analog: none — target-only capability."""
    li = load(spark, sf_dir, "lineitem")
    m = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "rev_cents"
        ),
        F.sum(F.col("l_quantity").cast("long")).alias("qty"),
    )
    wa = Window.orderBy(F.desc("rev_cents"), "part")
    wb = Window.orderBy(F.desc("qty"), "part")
    top = (
        m.withColumn("ra", F.row_number().over(wa))
        .withColumn("rb", F.row_number().over(wb))
        .filter(F.col("ra") <= 100)
    )
    a = top.select(
        F.col("part").alias("pa"), F.col("ra").alias("raa"),
        F.col("rb").alias("rba"),
    )
    b = top.select(
        F.col("part").alias("pb"), F.col("ra").alias("rab"),
        F.col("rb").alias("rbb"),
    )
    pairs = a.join(b, F.col("pa") < F.col("pb")).select(
        F.when(
            (F.col("raa") - F.col("rab")) * (F.col("rba") - F.col("rbb"))
            > 0,
            1,
        )
        .otherwise(0)
        .alias("conc")
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("conc").alias("concordant"),
        (F.count(F.lit(1)) - F.sum("conc")).alias("discordant"),
        F.expr(
            "(2 * sum(conc) - count(1)) * 1000000 DIV count(1)"
        ).alias("tau_micro"),
    )


@register(
    "q_rank_ndcg",
    oracle=f"""
    WITH bm AS ({get("q_text_bm25").oracle}),
    ranked AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bm25_e6 DESC, doc_id) AS rnk
        FROM bm
    ),
    tok AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(LOWER(text)), ' ')) AS word
        FROM documents
    ),
    tcnt AS (
        SELECT doc_id, word, COUNT(*) AS c
        FROM tok WHERE word IN ('spark', 'join', 'window')
        GROUP BY doc_id, word
    ),
    rel AS (
        SELECT doc_id FROM tcnt WHERE c >= 3
        GROUP BY doc_id HAVING COUNT(*) = 3
    ),
    nrel AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rel FROM rel),
    disc AS (
        SELECT r.rnk,
               CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_rel,
               CAST(ROUND(1000000.0 * LN(2.0)
                    / LN(CAST(r.rnk AS DOUBLE) + 1.0)) AS BIGINT) AS d
        FROM ranked r LEFT JOIN rel ON r.doc_id = rel.doc_id
    )
    SELECT (SELECT n_rel FROM nrel) AS n_rel,
           CAST(SUM(is_rel * d) AS BIGINT) AS dcg_micro,
           CAST(SUM(CASE WHEN rnk <= LEAST((SELECT n_rel FROM nrel), 20)
                    THEN d ELSE 0 END) AS BIGINT) AS idcg_micro,
           CAST(CASE WHEN SUM(CASE WHEN rnk <=
                        LEAST((SELECT n_rel FROM nrel), 20)
                        THEN d ELSE 0 END) > 0
                THEN 1000000 * SUM(is_rel * d)
                     // SUM(CASE WHEN rnk <=
                            LEAST((SELECT n_rel FROM nrel), 20)
                            THEN d ELSE 0 END)
                ELSE 0 END AS BIGINT) AS ndcg_ppm
    FROM disc
    """,
)
def q_rank_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@20 for the BM25 ranker — the graded-discount companion to
    q_rank_eval (which carries only rank-reciprocal metrics and
    documents WHY it skips NDCG: raw log2 is not bit-portable). The
    portability fix is the house log-term rule: each rank's discount
    1/log2(rnk+1) is written as the identical LN ratio on both engines
    and rounded ONCE to integer MICRO-units — the ~1-ulp cross-libm ln
    noise is ~8 orders below the rounding quantum — after which DCG,
    ideal DCG (first min(n_rel, 20) discounts — binary relevance), and
    the final ppm ratio are EXACT integer arithmetic, order-free and
    hash-stable. Same constant-size dataflow as q_rank_eval: 20-row
    ranked list, broadcast relevance join, single-row aggregate; only
    the relevance scan touches the corpus. Reference analog: none —
    target-only capability."""
    bm = q_text_bm25(spark, sf_dir)
    w = Window.orderBy(F.col("bm25_e6").desc(), "doc_id")
    ranked = bm.select("doc_id", F.row_number().over(w).alias("rnk"))
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_words(F.col("text"))).alias("word"))
    rel = (
        tok.filter(F.col("word").isin(BM25_QUERY))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 3)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nw"))
        .filter(F.col("nw") == len(BM25_QUERY))
        .select("doc_id", F.lit(1).alias("is_rel"))
    )
    nrel = rel.agg(F.count(F.lit(1)).cast("long").alias("n_rel"))
    disc = (
        ranked.join(F.broadcast(rel), "doc_id", "left")
        .select(
            "rnk",
            F.coalesce(F.col("is_rel"), F.lit(0)).alias("is_rel"),
            F.round(
                F.lit(1000000.0)
                * F.log(F.lit(2.0))
                / F.log(F.col("rnk").cast("double") + F.lit(1.0))
            )
            .cast("long")
            .alias("d"),
        )
        .crossJoin(F.broadcast(nrel))
    )
    m = F.least(F.col("n_rel"), F.lit(20))
    agg = disc.agg(
        F.max("n_rel").alias("n_rel"),
        F.sum(F.col("is_rel") * F.col("d")).alias("dcg_micro"),
        F.sum(F.when(F.col("rnk") <= m, F.col("d")).otherwise(0)).alias(
            "idcg_micro"
        ),
    )
    return agg.select(
        "n_rel",
        "dcg_micro",
        "idcg_micro",
        F.when(
            F.col("idcg_micro") > 0,
            F.expr("1000000 * dcg_micro DIV idcg_micro"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("ndcg_ppm"),
    )
