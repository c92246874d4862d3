"""Deterministic corpus-sampling operators over `documents`.

Training-data pipelines rarely train on the raw crawl: they *sample*
it — weighting documents by token count (so the epoch-token budget is
spent in proportion to content, not document count) and *rebalancing*
sources toward a target mixture (so one over-crawled source doesn't
dominate). Both are implemented here with zero RNG state: every
"random" draw is a portable md5-derived uniform that any worker (and
the DuckDB oracle) computes identically from the row itself, so the
sample is reproducible across engines, runs, and cluster sizes —
the property a 100 TB pipeline needs for auditable dataset builds.

Reference parity note: the reference demo (SURVEY §2.1) has no sampling
surface at all; these are Layer-C target-only operators mandated by the
BASELINE.json LLM-pipeline block, like the rest of `llm/`.

100 TB story: both operators are one narrow projection plus one
aggregation — no self-joins, no windows over the corpus. The weighted
sample is a global top-k (`TakeOrderedAndProject`: per-partition heaps
+ single driver merge of k·P candidate rows, never a full sort); the
mixture rebalance is a per-source count (map-side-combinable) broadcast
back over the corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

#: documents kept by the weighted sample (global top-k)
SAMPLE_K = 200


def _md5_uniform(col, salt: str):
    """Uniform in (0,1) from the first 8 md5 hex chars of ``salt||col``.

    (v + 0.5) / 2^32 — the +0.5 keeps u strictly positive (log-safe) and
    both the addition and the power-of-two division are exact in
    float64, so Spark and DuckDB produce bit-identical uniforms and
    every downstream comparison agrees across engines.
    """
    h = F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8)
    return (F.conv(h, 16, 10).cast("double") + F.lit(0.5)) / F.lit(4294967296.0)


@register(
    "q_sample_weighted",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, source,
               CEIL(LENGTH(text) / 4.0)::BIGINT AS n_tokens,
               LN((('0x' || SUBSTRING(MD5('wsample' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT + 0.5)
                  / 4294967296.0)
               / CEIL(LENGTH(text) / 4.0) AS key
        FROM documents
    )
    SELECT doc_id, source, n_tokens,
           CAST(ROUND(key * 1000000) AS BIGINT) AS sample_key_micro
    FROM keyed
    ORDER BY key DESC, doc_id
    LIMIT {SAMPLE_K}
    """,
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted sampling without replacement (Efraimidis–Spirakis,
    public algorithm): each doc draws a deterministic uniform u and is
    ranked by ln(u)/w with w = its token count — order-equivalent to
    the classic u^(1/w) key but numerically better spread — and the
    top-k ranked docs form the sample. Inclusion probability is
    proportional to token count, which is exactly how an epoch budget
    should weight long vs short documents.

    Scale shape: one narrow map computes the key from the row alone
    (no shuffle), then `ORDER BY key DESC LIMIT k` compiles to
    TakeOrderedAndProject — per-partition top-k heaps, merging only
    k rows per partition at the driver. No global sort at any scale.
    """
    d = load(spark, sf_dir, "documents")
    w = F.ceil(F.length("text") / 4.0)
    key = F.log(_md5_uniform(F.col("doc_id"), "wsample")) / w
    return (
        d.select(
            "doc_id",
            "source",
            w.cast("long").alias("n_tokens"),
            key.alias("_key"),
        )
        .orderBy(F.col("_key").desc(), "doc_id")
        .limit(SAMPLE_K)
        .select(
            "doc_id",
            "source",
            "n_tokens",
            # ln is NOT bit-portable across engines (fdlibm vs libm,
            # measured 1 ulp — ROUNDLOG r4), so the emitted key is
            # integer MICRO-nat units: the 5e-7 tie distance sits ~8
            # orders above the ulp noise, per the house log-term rule.
            # The ORDER BY still ranks on the exact key (a 1-ulp rank
            # flip needs two keys within ~1e-15 — measure-zero here).
            F.round(F.col("_key") * 1e6, 0).cast("long").alias("sample_key_micro"),
        )
    )


@register(
    "q_mix_sources",
    oracle="""
    WITH counts AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ),
    rates AS (
        SELECT source, n_docs,
               (SELECT MIN(n_docs) FROM counts) * 1.0 / n_docs AS accept_rate
        FROM counts
    ),
    kept AS (
        SELECT d.source, COUNT(*) AS n_sampled
        FROM documents d JOIN rates r ON d.source = r.source
        WHERE (('0x' || SUBSTRING(MD5('mix' || CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT + 0.5)
              / 4294967296.0 < r.accept_rate
        GROUP BY d.source
    )
    SELECT r.source, r.n_docs, r.accept_rate,
           COALESCE(k.n_sampled, 0) AS n_sampled
    FROM rates r LEFT JOIN kept k ON r.source = k.source
    ORDER BY r.source
    """,
)
def q_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture rebalancing: down-sample every source to the size
    of the smallest one (equal-share target mixture) with a
    deterministic per-doc acceptance test u < min_count/count(source).
    The audit returned per source — corpus size, acceptance rate, and
    rows actually kept — is the mixture report a dataset build logs.

    Scale shape: per-source counts are a map-side-combinable aggregate
    over a column-pruned scan; the tiny rate table is broadcast back
    onto the corpus scan, so the accept/reject pass is shuffle-free.
    Acceptance compares exact-float64 uniforms against an
    integer-ratio rate, so Spark and the oracle keep identical rows.
    """
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    rates = counts.withColumn(
        "accept_rate",
        F.min("n_docs").over(Window.partitionBy()) / F.col("n_docs"),
    )
    kept = (
        d.join(F.broadcast(rates), "source")
        .filter(_md5_uniform(F.col("doc_id"), "mix") < F.col("accept_rate"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            # RAW double: min_count/n is ONE identically-written IEEE
            # division of two exact longs on both engines — bit-equal
            # by construction. ROUND(x, 6) here would ADD a hazard
            # (Spark rounds the shortest decimal rendering, DuckDB the
            # binary value — the measured 333/640-class divergence),
            # so the un-rounded ratio is the hash-safe emission.
            "accept_rate",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
        )
        .orderBy("source")
    )


#: docs kept per language stratum by the exact stratified sample
STRATUM_K = 25


@register(
    "q_sample_stratified",
    oracle=f"""
    WITH ranked AS (
        SELECT lang, doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY MD5('strat' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    SELECT lang, doc_id, source, rn FROM ranked
    WHERE rn <= {STRATUM_K}
    ORDER BY lang, rn
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified sampling: exactly k docs per language stratum,
    chosen by ranking each stratum on a portable md5 draw — the
    balanced-eval-set builder. Unlike the Bernoulli hash samplers
    (`q_sample_hash`, rate-exact only in expectation), the window rank
    guarantees the per-stratum count exactly, which eval sets need.

    Scale shape: one shuffle on the stratum key, and the rank window
    is top-k-bounded — Catalyst's WindowGroupLimit pushes the rn <= k
    predicate into a per-partition group limit before the full sort
    materializes (same physical shape as q_topk_per_group). Strata
    counts are bounded by language cardinality, not corpus size, and a
    skewed stratum (one dominant language) splits under AQE.
    """
    d = load(spark, sf_dir, "documents")
    draw = F.md5(F.concat(F.lit("strat"), F.col("doc_id").cast("string")))
    rn = F.row_number().over(
        Window.partitionBy("lang").orderBy(draw, F.col("doc_id"))
    )
    return (
        d.select("lang", "doc_id", "source", rn.alias("rn"))
        .filter(F.col("rn") <= STRATUM_K)
        .orderBy("lang", "rn")
    )


@register(
    "q_shuffle_epoch",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               MD5(CONCAT('shuffle:epoch0:', CAST(doc_id AS VARCHAR))) AS k
        FROM documents
    ),
    r AS (
        SELECT doc_id, k, SUBSTR(k, 1, 2) AS bucket,
               ROW_NUMBER() OVER (ORDER BY k, doc_id) AS ord
        FROM t
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(ord) AS BIGINT) AS min_ord,
           CAST(MAX(ord) AS BIGINT) AS max_ord,
           CAST(SUM(ord * doc_id) AS BIGINT) AS checksum
    FROM r GROUP BY bucket
    """,
)
def q_shuffle_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global epoch shuffle: every doc gets a portable
    md5 draw keyed by (epoch, doc_id), and the training order is the
    global rank under (draw, doc_id) — the reproducible permutation a
    pretraining run reads the corpus in. Emits per-bucket order ranges
    plus SUM(ordinal * doc_id) as a permutation checksum, so the oracle
    verifies EVERY ordinal assignment through 256 output rows instead
    of materializing the corpus.

    The global rank never funnels through one task: the first hex byte
    of the draw is an order-preserving range bucket (md5 is uniform, so
    the 256 buckets are balanced by construction — no sampling pass
    needed, unlike range-partitioning on data-dependent keys); the tiny
    per-bucket counts prefix-sum into offsets (256-row window) and each
    bucket ranks locally in parallel: ordinal = offset + local
    row_number — the q_sort_zorder / TeraSort decomposition. At 100 TB
    the checksum would wrap BIGINT and move to modular arithmetic;
    shuffle-write of the permutation itself is `repartitionByRange` on
    the same draw (one skew-free exchange), with per-epoch keys giving
    fresh, independent permutations."""
    d = load(spark, sf_dir, "documents")
    k = F.md5(F.concat(F.lit("shuffle:epoch0:"), F.col("doc_id").cast("string")))
    t = d.select("doc_id", k.alias("k"), F.substring(k, 1, 2).alias("bucket"))
    counts = t.groupBy("bucket").agg(F.count(F.lit(1)).alias("nb"))
    offsets = counts.withColumn(
        "offset",
        F.coalesce(
            F.sum("nb").over(
                Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("bucket", "offset")
    local_rn = F.row_number().over(
        Window.partitionBy("bucket").orderBy("k", "doc_id")
    )
    return (
        t.join(F.broadcast(offsets), "bucket")
        .withColumn("ord", (F.col("offset") + local_rn).cast("long"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ord").alias("min_ord"),
            F.max("ord").alias("max_ord"),
            F.sum(F.col("ord") * F.col("doc_id")).alias("checksum"),
        )
    )


#: temperature exponent for source rebalancing (the multilingual
#: sampling trick of mBERT/XLM: p_i ∝ n_i^alpha flattens the source
#: distribution — alpha=1 keeps natural proportions, alpha=0 is
#: equal-share; 0.7 is the published middle ground).
MIX_ALPHA = 0.7
#: fraction of the corpus the temperature-mixed sample targets
MIX_TARGET_FRAC = 0.5


@register(
    "q_sample_temperature",
    oracle=f"""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
    ),
    pw AS (SELECT lang, n_docs,
                  CAST(ROUND(POWER(n_docs, {MIX_ALPHA}) * 1000000.0) AS BIGINT)
                      AS pow_u
           FROM counts),
    tot AS (SELECT SUM(n_docs) AS n_total,
                   CAST(SUM(pow_u) AS BIGINT) AS z_u
            FROM pw),
    rates AS (
        SELECT lang, n_docs,
               CAST(LEAST(1000000, ROUND(
                   ({MIX_TARGET_FRAC} * tot.n_total)
                   * pw.pow_u / tot.z_u / n_docs
                   * 1000000.0)) AS BIGINT) AS rate_u
        FROM pw CROSS JOIN tot
    ),
    kept AS (
        SELECT d.lang, COUNT(*) AS n_sampled
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE (('0x' || SUBSTRING(MD5('temp' || CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT + 0.5)
              / 4294967296.0 < r.rate_u / 1000000.0
        GROUP BY d.lang
    )
    SELECT r.lang, r.n_docs, r.rate_u,
           COALESCE(k.n_sampled, 0) AS n_sampled
    FROM rates r LEFT JOIN kept k ON r.lang = k.lang
    ORDER BY r.lang
    """,
)
def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-SCALED source mixing (mBERT/XLM exponentiated
    sampling): target shares p_i ∝ n_i^0.7 give under-represented
    LANGUAGES more than their natural share without letting the
    dominant one swamp the mixture (the fixture's en:fr ratio is 3.4:1;
    at alpha=0.7 the sampled ratio flattens toward ~2.4:1); per-doc acceptance rate = target_total·p_i/n_i, capped at
    1. The mixture-report output (corpus size, micro-unit rate, rows
    kept per source) is what a multilingual/multi-domain dataset build
    logs next to its training config.

    Float discipline: POWER is the one non-portable step (libm vs JVM
    StrictMath differ in the last ulp), so each source's rate is
    rounded ONCE to integer micro-units — 10 orders coarser than ulp
    noise — and the acceptance test compares the portable md5 uniform
    to rate_u/1e6 (one identical IEEE division). Everything downstream
    is exact integers.

    Scale shape: identical to q_mix_sources — per-source counts
    map-side combine, the |sources|-row rate table broadcasts back over
    one corpus scan, no shuffle of the corpus itself."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy()
    # each pow term is micro-rounded ONCE (ulp-portable), so the
    # normalizer Z is an exact BIGINT sum — order-free; a raw
    # SUM(POWER(...)) over doubles would be partial-sum-order-dependent
    # (the r1-r3 hash-fail mechanism, caught in the r4 second review)
    pow_u = F.round(F.pow(F.col("n_docs"), MIX_ALPHA) * 1000000.0, 0).cast(
        "long"
    )
    rates = counts.withColumn("pow_u", pow_u).withColumn(
        "rate_u",
        F.least(
            F.lit(1000000),
            F.round(
                (MIX_TARGET_FRAC * F.sum("n_docs").over(w))
                * F.col("pow_u")
                / F.sum("pow_u").over(w)
                / F.col("n_docs")
                * 1000000.0,
                0,
            ).cast("long"),
        ),
    )
    kept = (
        d.join(F.broadcast(rates), "lang")
        .filter(
            _md5_uniform(F.col("doc_id"), "temp")
            < F.col("rate_u") / 1000000.0
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return (
        rates.join(kept, "lang", "left")
        .select(
            "lang",
            "n_docs",
            "rate_u",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
        )
        .orderBy("lang")
    )


@register(
    "q_sample_ppl_band",
    oracle="""
    WITH tok AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(LOWER(text)), ' ')) AS w
        FROM documents
    ),
    lm AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    tot AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM lm),
    nll AS (
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(CAST(ROUND(-(LN((lm.c + 1.0) / (tot.n + tot.v)) / LN(2.0))
                                   * 1000000.0) AS BIGINT)) AS BIGINT) AS nll_e6
        FROM tok t JOIN lm ON t.w = lm.w CROSS JOIN tot
        GROUP BY t.doc_id
    ),
    scored AS (
        SELECT d.doc_id, d.lang,
               CAST((nll.nll_e6 * 1000) // nll.n_words AS BIGINT) AS ce_milli
        FROM nll JOIN documents d ON nll.doc_id = d.doc_id
    ),
    ranked AS (
        SELECT doc_id, lang, ce_milli,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY ce_milli, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n_lang
        FROM scored
    )
    SELECT doc_id, lang, ce_milli, CAST(rn AS BIGINT) AS rn,
           (10 * rn > n_lang AND 10 * rn <= 9 * n_lang) AS keep
    FROM ranked
    """,
)
def q_sample_ppl_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-band data selection (the CCNet/Wenzek et al. 2020
    curation cut): rank every document within its language by unigram
    cross-entropy and keep only the middle 10–90% band — the lowest
    decile is boilerplate/degenerate text the LM finds too easy, the
    top decile is noise it finds too alien; both get cut before
    training.

    Portability: the per-doc score is the EXACT integer
    (nll_e6 · 1000) div n_words (each log term rounded ONCE to
    micro-units — the house log rule — then summed exactly; integer
    division is truncation on both engines for these positive values),
    the rank is over (ce_milli, doc_id), and the band test is pure
    integer arithmetic (10·rn > n ∧ 10·rn ≤ 9·n). All-integer/boolean
    emissions.

    Scale shape: LM build + scoring = the q_text_perplexity plan
    (vocab-keyed join, AQE-decided build side); the banding adds one
    language-keyed window whose partitions are language-sized and
    split under AQE if one language dominates."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.trim(F.lower(F.col("text"))), " ")).alias("w")
    )
    lm = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = lm.agg(F.sum("c").alias("n"), F.count(F.lit(1)).alias("v"))
    nll = (
        tok.join(lm, "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(
                -(
                    F.log((F.col("c") + 1.0) / (F.col("n") + F.col("v")))
                    / F.log(F.lit(2.0))
                )
                * 1000000.0,
                0,
            )
            .cast("long")
            .alias("nll_e6"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("nll_e6").alias("nll_e6"),
        )
    )
    scored = nll.join(d.select("doc_id", "lang"), "doc_id").select(
        "doc_id",
        "lang",
        F.expr("(nll_e6 * 1000) div n_words").alias("ce_milli"),
    )
    wl = Window.partitionBy("lang")
    ranked = scored.select(
        "doc_id",
        "lang",
        "ce_milli",
        F.row_number()
        .over(wl.orderBy("ce_milli", "doc_id"))
        .cast("long")
        .alias("rn"),
        F.count(F.lit(1)).over(wl).alias("n_lang"),
    )
    return ranked.select(
        "doc_id",
        "lang",
        "ce_milli",
        "rn",
        (
            (10 * F.col("rn") > F.col("n_lang"))
            & (10 * F.col("rn") <= 9 * F.col("n_lang"))
        ).alias("keep"),
    )


_DSIR_B = 256  #: hashed-feature buckets (2^32-safe md5 prefix mod B)
_DSIR_TARGET = "src0"  #: stand-in high-quality target domain
_DSIR_K = 100  #: selected pool documents


@register(
    "q_select_dsir",
    oracle=f"""
    WITH tokt AS (
        SELECT CAST(('0x' || SUBSTRING(MD5(w), 1, 8))::UBIGINT % {_DSIR_B}
                    AS BIGINT) AS b
        FROM (SELECT UNNEST(STRING_SPLIT(TRIM(LOWER(text)), ' ')) AS w
              FROM documents WHERE source = '{_DSIR_TARGET}')
        WHERE LENGTH(w) > 0
    ),
    tokp AS (
        SELECT doc_id, source,
               CAST(('0x' || SUBSTRING(MD5(w), 1, 8))::UBIGINT % {_DSIR_B}
                    AS BIGINT) AS b
        FROM (SELECT doc_id, source,
                     UNNEST(STRING_SPLIT(TRIM(LOWER(text)), ' ')) AS w
              FROM documents WHERE source <> '{_DSIR_TARGET}')
        WHERE LENGTH(w) > 0
    ),
    ct AS (SELECT b, COUNT(*) AS c FROM tokt GROUP BY b),
    cp AS (SELECT b, COUNT(*) AS c FROM tokp GROUP BY b),
    nt AS (SELECT COUNT(*) AS n FROM tokt),
    np AS (SELECT COUNT(*) AS n FROM tokp),
    lr AS (
        SELECT cp.b,
               CAST(ROUND((LN((COALESCE(ct.c, 0) + 1.0) / (nt.n + {_DSIR_B}))
                         - LN((cp.c + 1.0) / (np.n + {_DSIR_B})))
                          * 1000000.0) AS BIGINT) AS lr_e6
        FROM cp LEFT JOIN ct ON cp.b = ct.b CROSS JOIN nt CROSS JOIN np
    )
    SELECT t.doc_id,
           ANY_VALUE(t.source) AS source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(lr.lr_e6) AS BIGINT) AS logw_e6
    FROM tokp t JOIN lr ON t.b = lr.b
    GROUP BY t.doc_id
    ORDER BY logw_e6 DESC, t.doc_id
    LIMIT {_DSIR_K}
    """,
)
def q_select_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw-pool
    document by how much its HASHED-unigram feature distribution looks
    like the target domain — log importance weight
    Σ_tokens ln(p_target(bucket)/p_pool(bucket)), add-one smoothed over
    256 md5 buckets — and keep the top-100. This is the
    published scalable recipe for "find me more data like Wikipedia in
    Common Crawl"; the deterministic top-k is DSIR's argmax variant
    (the stochastic resample would add a Gumbel draw from the same
    portable-md5 uniforms `q_sample_weighted` uses).

    Scale shape: the feature space is CONSTANT-sized (B=256
    buckets — DSIR's own trick for corpus-scale tractability), so both
    n-gram models aggregate to ≤B rows and the per-bucket log-ratio
    table is a justified PINNED broadcast (bounded by construction,
    unlike vocabulary tables); the pool token stream joins it
    map-side — zero shuffle — and the per-doc rollup is one hash
    aggregate; top-k is TakeOrderedAndProject. Portability: the bucket
    is a shared md5-prefix hash, each log-ratio is rounded ONCE per
    bucket to integer micro-nats, per-doc sums are exact BIGINT."""
    d = load(spark, sf_dir, "documents")

    def toks(df):
        return df.select(
            "doc_id",
            "source",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), " ")).alias("w"),
        ).filter(F.length("w") > 0).withColumn(
            "b",
            (F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("long")
             % _DSIR_B),
        )

    # (r13 optimization round) One token scan builds BOTH 256-bucket
    # histograms and both totals: the former four-subtree shape (ct,
    # cp, nt, np — each its own full documents scan + explode + md5 per
    # token) collapses to a single conditional aggregation; the scalar
    # totals nt = Σ ctc / np = Σ cpc re-aggregate the ≤B-row bucket
    # table (its shuffle is reused across the two references — the
    # second pass is a 256-row aggregate, not a corpus pass). 4 scans
    # → 2 in the plan; identical arithmetic, so lr_e6 is bit-identical.
    tokp = toks(d.filter(F.col("source") != _DSIR_TARGET))
    is_t = F.col("source") == _DSIR_TARGET
    buckets = toks(d).groupBy("b").agg(
        F.sum(F.when(is_t, 1).otherwise(0)).alias("ctc"),
        F.sum(F.when(is_t, 0).otherwise(1)).alias("cpc"),
    )
    totals = buckets.agg(
        F.sum("ctc").alias("nt"), F.sum("cpc").alias("np")
    )
    lr = (
        buckets.filter(F.col("cpc") > 0)
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.round(
                (
                    F.log(
                        (F.coalesce(F.col("ctc"), F.lit(0)) + 1.0)
                        / (F.col("nt") + _DSIR_B)
                    )
                    - F.log((F.col("cpc") + 1.0) / (F.col("np") + _DSIR_B))
                )
                * 1000000.0,
                0,
            )
            .cast("long")
            .alias("lr_e6"),
        )
    )
    # `source` rides as a GROUPING KEY (constant per doc), not an
    # any_value aggregate: a string aggregation buffer is not
    # UnsafeRow-mutable and forced the per-doc rollup into a
    # SortAggregate — as a key it hash-aggregates (r13; plan went
    # SortAggregate+Sort → HashAggregate).
    return (
        tokp.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lr_e6").alias("logw_e6"),
        )
        .select("doc_id", "source", "n_tokens", "logw_e6")
        .orderBy(F.col("logw_e6").desc(), "doc_id")
        .limit(_DSIR_K)
    )


@register(
    "q_order_curriculum",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
               CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS n_tokens
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, lang, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY n_tokens, doc_id) AS rl
        FROM scored
    )
    SELECT doc_id, lang, n_tokens, CAST(rl AS BIGINT) AS round_idx,
           CAST(ROW_NUMBER() OVER (ORDER BY rl, lang) AS BIGINT)
               AS global_ord
    FROM ranked
    """,
)
def q_order_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order construction: a short-to-long
    LENGTH curriculum (sequence-length curricula à la Shortformer,
    Press et al. 2021) interleaved ROUND-ROBIN across languages so no
    language is ghettoized at either end of an epoch — round r of the
    schedule is "every language's r-th shortest document", languages in
    lexicographic order within a round.

    Scale shape: the per-language rank is one lang-partitioned window
    (language-sized partitions, AQE-split if one dominates). The GLOBAL
    ordinal is then a CLOSED FORM, not a window: with the per-language
    size histogram broadcast as a ~|langs|-row array,
        global_ord(rl, lang) = Σ_l min(n_l, rl-1)            (full+partial
                                                              earlier rounds)
                             + rank of lang among {l : n_l ≥ rl}  (position
                                                              in own round)
    — a single-partition ROW_NUMBER() over the whole corpus (what the
    DuckDB oracle does, and what a naive port would do) is the classic
    scale-killer this avoids; the oracle equivalence IS the proof the
    closed form computes the same total order. Companion of
    `q_shuffle_epoch` (random order) and `q_ordinal_assign`
    (bucket+offset ordinals for arbitrary keys); all-integer emissions.
    """
    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        F.ceil(F.length("text") / 4.0).cast("long").alias("n_tokens"),
    )
    rl = (
        F.row_number()
        .over(Window.partitionBy("lang").orderBy("n_tokens", "doc_id"))
        .cast("long")
    )
    ranked = scored.withColumn("round_idx", rl)
    sizes = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_l"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("lang").alias("l"), F.col("n_l")))
            ).alias("ls")
        )
    )
    return (
        ranked.crossJoin(F.broadcast(sizes))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "round_idx",
            (
                F.expr(
                    "aggregate(ls, 0L, (acc, x) ->"
                    " acc + least(x.n_l, round_idx - 1))"
                )
                + F.expr(
                    "size(filter(ls, x -> x.n_l >= round_idx AND x.l < lang))"
                )
                + 1
            )
            .cast("long")
            .alias("global_ord"),
        )
    )


@register(
    "q_sample_class_quota",
    oracle="""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    quota AS (SELECT MIN(n) AS q FROM counts),
    ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY ('0x' || SUBSTRING(MD5('quota' ||
                             CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT,
                            doc_id
               ) AS rn
        FROM documents
    )
    SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn
    FROM ranked, quota
    WHERE rn <= q
    ORDER BY lang, rn
    """,
)
def q_sample_class_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-QUOTA CLASS BALANCING — keep exactly min-class-count docs
    per language, the guaranteed-size complement to q_mix_sources'
    Bernoulli rates (which only balance in EXPECTATION; a training
    curriculum that hard-requires equal per-language shard sizes needs
    quotas, not rates). Selection is a deterministic hash LOTTERY: docs
    rank by the portable md5-prefix key (FIXTURES.md idiom, seeded
    'quota') within their language, and ranks <= quota survive — a
    per-class top-k, planned as one hash partition + per-class sort; no
    global sort, and the quota scalar is a 1-row broadcast. Ties
    impossible (doc_id tiebreak). At 100 TB the same plan holds with
    per-class parallel sort; for quotas >> memory swap row_number for
    the q_topk_per_group rank-filter shape. Emits (doc_id, lang, rank).
    Reference analog: none — target-only capability."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    quota = counts.agg(F.min("n").alias("q"))
    h = F.expr(
        "CAST(conv(substring(md5(concat('quota', CAST(doc_id AS STRING))),"
        " 1, 8), 16, 10) AS BIGINT)"
    )
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    ranked = d.select(
        "doc_id", "lang", F.row_number().over(w).cast("long").alias("rn")
    )
    return (
        ranked.crossJoin(F.broadcast(quota))
        .filter(F.col("rn") <= F.col("q"))
        .select("doc_id", "lang", "rn")
        .orderBy("lang", "rn")
    )
