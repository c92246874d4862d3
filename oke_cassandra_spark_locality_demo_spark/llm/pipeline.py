"""End-to-end training-data pipeline (the BASELINE.json workload, composed).

One DataFrame program chaining the LLM operators the way a real corpus
build does:

    documents
      → quality gate          (length band + lexical diversity)
      → exact dedup           (normalized-text min_by)
      → language filter       (keep en/es/de/fr)
      → token accounting      (whitespace + chars/4 BPE estimate)
      → join embeddings       (multimodal: text + vector in one row)
      → per-language summary  (docs kept, tokens, mean vector norm)

Every stage is a built-in-function transformation — the whole pipeline
is one Catalyst plan (scan → filter → agg → broadcast-joins → agg), so
AQE sees it end-to-end. At 100 TB: the quality/lang filters prune
before the dedup shuffle (the only wide dependency on documents), and
the embedding join is keyed on the dedup survivor set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

_KEEP_LANGS = ("en", "es", "de", "fr")


@register(
    "q_pipeline_e2e",
    oracle="""
    WITH gated AS (
        SELECT doc_id, lang, text,
               LEN(STRING_SPLIT(TRIM(LOWER(text)), ' ')) AS n_words
        FROM documents
        WHERE LEN(STRING_SPLIT(TRIM(LOWER(text)), ' ')) BETWEEN 20 AND 1000
          AND CAST(LEN(LIST_DISTINCT(STRING_SPLIT(TRIM(LOWER(text)), ' '))) AS DOUBLE)
              / LEN(STRING_SPLIT(TRIM(LOWER(text)), ' ')) >= 0.3
          AND lang IN ('en', 'es', 'de', 'fr')
    ),
    deduped AS (
        SELECT doc_id, lang, n_words,
               CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS bpe_tokens
        FROM gated
        QUALIFY ROW_NUMBER() OVER (PARTITION BY TRIM(LOWER(text)) ORDER BY doc_id) = 1
    ),
    joined AS (
        SELECT d.lang, d.n_words, d.bpe_tokens,
               SQRT(LIST_DOT_PRODUCT(CAST(e.embedding AS DOUBLE[]),
                                     CAST(e.embedding AS DOUBLE[]))) AS l2
        FROM deduped d JOIN embeddings e ON d.doc_id = e.vec_id
    )
    SELECT lang,
           COUNT(*) AS docs_kept,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(SUM(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
           ROUND(CAST(ROUND(SUM(CAST(l2 AS DECIMAL(28,8))), 4) AS DOUBLE) / COUNT(*), 4)
               AS mean_l2
    FROM joined
    GROUP BY lang
    """,
)
def q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate → exact dedup → language filter → token accounting →
    embedding join → per-language corpus summary, in one Catalyst plan."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), " ")
    n_words = F.size(words)
    uniq_ratio = F.size(F.array_distinct(words)).cast("double") / n_words

    gated = d.filter(
        n_words.between(20, 1000)
        & (uniq_ratio >= 0.3)
        & F.col("lang").isin(*_KEEP_LANGS)
    ).select(
        "doc_id",
        "lang",
        F.trim(F.lower(F.col("text"))).alias("_norm"),
        n_words.alias("n_words"),
        F.ceil(F.length("text") / 4.0).alias("bpe_tokens"),
    )

    deduped = (
        gated.groupBy("_norm")
        .agg(
            F.min_by(
                F.struct("doc_id", "lang", "n_words", "bpe_tokens"), F.col("doc_id")
            ).alias("r")
        )
        .select("r.doc_id", "r.lang", "r.n_words", "r.bpe_tokens")
    )

    e = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    l2 = F.sqrt(
        F.aggregate(F.zip_with(v, v, lambda p, q: p * q), F.lit(0.0), lambda a, z: a + z)
    )
    joined = deduped.join(e, deduped.doc_id == e.vec_id).select(
        "lang", "n_words", "bpe_tokens", l2.alias("l2")
    )

    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs_kept"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.sum("bpe_tokens").cast("long").alias("total_bpe_tokens"),
        F.round(
            F.round(F.sum(F.col("l2").cast("decimal(28,8)")), 4).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("mean_l2"),
    )
