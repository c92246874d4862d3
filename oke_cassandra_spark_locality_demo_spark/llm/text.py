"""Text analysis over `documents` (SURVEY §2.3 LLM block): quality
scoring, language ID, token counting, fingerprinting, tf-idf.

All hot-path expressions are built-in column functions (codegen'd);
nothing here drops to Python per row. Word-level stats go through
split/explode — one narrow stage plus one groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

#: tiny function-word lists for the n-gram/stopword language heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "en", "los"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit"],
    "fr": ["le", "la", "les", "de", "et", "est", "dans"],
}
_STOPWORDS = _LANG_MARKERS["en"]


def _words(c: Column) -> Column:
    return F.split(F.trim(F.lower(c)), " ")


@register(
    "q_text_stats",
    oracle="""
    SELECT doc_id, lang,
           LENGTH(text) AS n_chars_actual,
           CAST(LEN(STRING_SPLIT(TRIM(LOWER(text)), ' ')) AS INTEGER) AS n_words,
           CAST(LEN(LIST_DISTINCT(STRING_SPLIT(TRIM(LOWER(text)), ' '))) AS INTEGER)
               AS n_unique_words,
           ROUND(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                 / LEN(STRING_SPLIT(TRIM(LOWER(text)), ' ')), 4) AS avg_word_len,
           ROUND(CAST(LEN(LIST_FILTER(STRING_SPLIT(TRIM(LOWER(text)), ' '),
                                      w -> LIST_CONTAINS(['the','and','of','to','a','in','is'], w)))
                      AS DOUBLE)
                 / LEN(STRING_SPLIT(TRIM(LOWER(text)), ' ')), 4) AS stopword_ratio
    FROM documents
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text statistics: char/word/unique-word counts, mean
    word length, stopword ratio — the standard quality-filter features."""
    d = load(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    n_words = F.size(words)
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    return d.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars_actual"),
        n_words.alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_unique_words"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / n_words,
            4,
        ).alias("avg_word_len"),
        F.round(n_stop.cast("double") / n_words, 4).alias("stopword_ratio"),
    )


@register(
    "q_text_quality",
    oracle="""
    WITH feats AS (
        SELECT doc_id,
               LEN(STRING_SPLIT(TRIM(LOWER(text)), ' ')) AS n_words,
               CAST(LEN(LIST_DISTINCT(STRING_SPLIT(TRIM(LOWER(text)), ' '))) AS DOUBLE)
                   / LEN(STRING_SPLIT(TRIM(LOWER(text)), ' ')) AS uniq_ratio
        FROM documents
    )
    SELECT doc_id,
           CAST(ROUND((CASE WHEN n_words BETWEEN 20 AND 1000 THEN 0.5 ELSE 0.0 END)
                 + (CASE WHEN uniq_ratio >= 0.3 THEN 0.5 ELSE 0.0 END), 2) AS DOUBLE) AS quality,
           (n_words BETWEEN 20 AND 1000 AND uniq_ratio >= 0.3) AS keep
    FROM feats
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score (length band + lexical diversity) and the
    keep/drop verdict — the Gopher-style rule-based quality gate shape."""
    d = load(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    n_words = F.size(words)
    uniq_ratio = F.size(F.array_distinct(words)).cast("double") / n_words
    len_ok = n_words.between(20, 1000)
    uniq_ok = uniq_ratio >= 0.3
    return d.select(
        "doc_id",
        F.round(
            F.when(len_ok, 0.5).otherwise(0.0) + F.when(uniq_ok, 0.5).otherwise(0.0), 2
        ).alias("quality"),
        (len_ok & uniq_ok).alias("keep"),
    )


def _marker_score(words: Column, lang: str) -> Column:
    arr = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))


_LANGID_ORACLE = """
WITH scored AS (
    SELECT doc_id, lang AS labeled_lang,
           LEN(LIST_FILTER(STRING_SPLIT(TRIM(LOWER(text)), ' '),
                           w -> LIST_CONTAINS(['the','and','of','to','a','in','is'], w))) AS s_en,
           LEN(LIST_FILTER(STRING_SPLIT(TRIM(LOWER(text)), ' '),
                           w -> LIST_CONTAINS(['el','la','de','que','y','en','los'], w))) AS s_es,
           LEN(LIST_FILTER(STRING_SPLIT(TRIM(LOWER(text)), ' '),
                           w -> LIST_CONTAINS(['der','die','und','das','ist','von','mit'], w))) AS s_de,
           LEN(LIST_FILTER(STRING_SPLIT(TRIM(LOWER(text)), ' '),
                           w -> LIST_CONTAINS(['le','la','les','de','et','est','dans'], w))) AS s_fr
    FROM documents
)
SELECT doc_id, labeled_lang,
       CAST(s_en AS INTEGER) AS s_en, CAST(s_es AS INTEGER) AS s_es,
       CAST(s_de AS INTEGER) AS s_de, CAST(s_fr AS INTEGER) AS s_fr,
       CASE
         WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
         WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
         WHEN s_de >= s_fr THEN 'de'
         ELSE 'fr'
       END AS predicted_lang
FROM scored
"""


@register("q_text_langid", oracle=_LANGID_ORACLE)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Function-word language-ID heuristic: score each language's marker
    list, argmax with a fixed priority order for ties (en > es > de > fr)
    — same deterministic cascade in the oracle."""
    d = load(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    s = {lang: _marker_score(words, lang) for lang in _LANG_MARKERS}
    predicted = (
        F.when(
            (s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]), "en"
        )
        .when((s["es"] >= s["de"]) & (s["es"] >= s["fr"]), "es")
        .when(s["de"] >= s["fr"], "de")
        .otherwise("fr")
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        s["en"].alias("s_en"),
        s["es"].alias("s_es"),
        s["de"].alias("s_de"),
        s["fr"].alias("s_fr"),
        predicted.alias("predicted_lang"),
    )


@register(
    "q_text_tokens",
    oracle="""
    SELECT doc_id,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS INTEGER) AS ws_tokens,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-z0-9]+')) AS INTEGER) AS re_tokens,
           CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS bpe_estimate
    FROM documents
    """,
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, regex word tokens,
    and the chars/4 BPE-scale estimate used for budget accounting."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0)).alias(
            "re_tokens"
        ),
        F.ceil(F.length("text") / 4.0).alias("bpe_estimate"),
    )


@register(
    "q_text_fingerprint",
    oracle="""
    SELECT doc_id,
           MD5(text) AS md5_fp,
           SHA256(text) AS sha256_fp,
           MD5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(
               STRING_SPLIT(TRIM(LOWER(text)), ' '))), ' ')) AS bow_fp
    FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact content hashes (md5/sha256) plus an
    order-insensitive bag-of-words fingerprint (sorted unique words →
    md5) that survives word reordering — the cheap first-pass dedup key."""
    d = load(spark, sf_dir, "documents")
    sorted_words = F.sort_array(F.array_distinct(_words(F.col("text"))))
    return d.select(
        "doc_id",
        F.md5("text").alias("md5_fp"),
        F.sha2("text", 256).alias("sha256_fp"),
        F.md5(F.concat_ws(" ", sorted_words)).alias("bow_fp"),
    )


@register(
    "q_text_tfidf",
    oracle="""
    WITH tf AS (
        SELECT doc_id, word, COUNT(*) AS tf
        FROM (SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(LOWER(text)), ' ')) AS word
              FROM documents)
        GROUP BY doc_id, word
    ),
    df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.word,
               ROUND(tf.tf * (LN((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
        FROM tf JOIN df USING (word) CROSS JOIN n
    )
    SELECT doc_id, word AS top_word, tfidf AS top_tfidf
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word ASC) = 1
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-DataFrame tf-idf (smooth idf), reporting each document's top
    term. Unlike MLlib's HashingTF (feature-hashed, unreadable), this
    keeps real terms and is exactly reproducible in SQL. Two shuffles:
    (doc,word) counts, then the doc-frequency join keyed on word."""
    d = load(spark, sf_dir, "documents")
    # N as a broadcast 1-row join, not a driver-side count(): keeps the
    # whole query one job and N out of the driver
    n_docs_df = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    tf = (
        d.select("doc_id", F.explode(_words(F.col("text"))).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    # tf⨝df stays a shuffle join: vocabulary is unbounded at scale, so df
    # must not be broadcast (AQE will still broadcast it when it's small)
    scored = (
        tf.join(df, "word")
        .crossJoin(F.broadcast(n_docs_df))
        .select(
            "doc_id",
            "word",
            F.round(
                F.col("tf") * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("word").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("word").alias("top_word"), F.col("tfidf").alias("top_tfidf"))
    )
