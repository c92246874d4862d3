"""UDF / UDAF / UDTF surface (SURVEY §2.3 "UDF / UDAF / UDTF").

Ranked by cost, the engine's policy order is:
  1. built-in column functions        (JVM, codegen — everything else
                                       in this repo)
  2. @pandas_udf / applyInPandas      (Arrow batches, vectorized numpy)
  3. @udf row-at-a-time Python        (pickle per row — demonstrated
                                       here because the surface must
                                       exist, never used on hot paths)

Each query's logic is deliberately SQL-expressible so the DuckDB oracle
can verify the UDF machinery itself (serialization, null handling,
type mapping) rather than novel semantics.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load, register_views
from ..registry import EVENTS_US, register


@F.udf(T.StringType())
def _priority_tag(priority: str, total: float) -> str:
    """Row-at-a-time Python UDF: tag urgent+large orders."""
    if priority is None or total is None:
        return "unknown"
    if "URGENT" in priority and total > 200000:
        return "hot"
    if total > 300000:
        return "large"
    return "normal"


@register(
    "q_udf_python",
    oracle="""
    SELECT o_orderkey,
           CASE
             WHEN o_orderpriority LIKE '%URGENT%' AND o_totalprice > 200000 THEN 'hot'
             WHEN o_totalprice > 300000 THEN 'large'
             ELSE 'normal'
           END AS tag
    FROM orders
    """,
)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Python UDF (row-at-a-time pickle path). Exists to cover the
    API surface; the oracle re-expresses the logic in SQL — which is also
    exactly how this UDF *should* be written in production (≈100×
    cheaper as a CASE expression)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", _priority_tag("o_orderpriority", "o_totalprice").alias("tag")
    )


@F.pandas_udf(T.DoubleType())
def _zscore_denom(v: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF: numpy arithmetic over Arrow batches."""
    return (v * 1.07).round(4)


@register(
    "q_udf_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * 1.07, 4) AS taxed_price
    FROM lineitem
    """,
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF (Arrow batch transfer, ~10-100× the row
    UDF's throughput). numpy's round is banker's rounding — but at 4 dp
    on ≤2 dp inputs scaled by 1.07 (≤4 dp true values) no rounding
    actually occurs, so it matches SQL ROUND exactly."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _zscore_denom("l_extendedprice").alias("taxed_price"),
    )


def _per_segment_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map UDAF body: per-segment aggregate in pandas."""
    import numpy as np

    return pd.DataFrame(
        {
            "c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
            "n_customers": [len(pdf)],
            # half-cent integer units (FIXTURES parity rules): a float
            # sum — even a sorted one — is only equal to the oracle's
            # exact sum by luck of magnitude; np.rint(x*100)→int64 is
            # exact, order-free, and matches ROUND(x*100)::BIGINT
            # (money doubles sit ~1e-13 off the true half-cent, never
            # near the .5 knife edge)
            "total_acctbal_hc": [
                int(
                    np.rint(pdf["c_acctbal"].to_numpy() * 100.0)
                    .astype(np.int64)
                    .sum()
                )
            ],
        }
    )


@register(
    "q_udf_grouped_agg",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100.0) AS BIGINT)) AS BIGINT)
               AS total_acctbal_hc
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDAF via applyInPandas: whole group in, one
    aggregate row out. The money sum is computed in exact half-cent
    int64 units inside the UDF (order-free, batch-order-independent)
    and emitted as BIGINT — the same integer-units discipline the
    JVM-side aggregates use (FIXTURES.md parity rules)."""
    c = load(spark, sf_dir, "customer")
    schema = T.StructType(
        [
            T.StructField("c_mktsegment", T.StringType()),
            T.StructField("n_customers", T.LongType()),
            T.StructField("total_acctbal_hc", T.LongType()),
        ]
    )
    return c.groupBy("c_mktsegment").applyInPandas(_per_segment_stats, schema)


@register(
    "q_udtf",
    oracle="""
    SELECT doc_id, word, CAST(pos AS INTEGER) AS pos
    FROM (
        SELECT doc_id,
               UNNEST(STRING_SPLIT(TRIM(LOWER(text)), ' ')[1:5]) AS word,
               UNNEST(RANGE(1, LEAST(LEN(STRING_SPLIT(TRIM(LOWER(text)), ' ')), 5) + 1)) AS pos
        FROM documents
    )
    WHERE LENGTH(word) > 3
    """,
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table function (1 row → N rows): posexplode over the first 5
    words, filtered — the lateral-view UDTF shape. Expressed with
    built-in posexplode (Spark's native UDTF mechanism); pos is shifted
    to 1-based to match SQL ordinality."""
    d = load(spark, sf_dir, "documents")
    words5 = F.slice(F.split(F.trim(F.lower(F.col("text"))), " "), 1, 5)
    exploded = d.select("doc_id", F.posexplode(words5).alias("pos0", "word"))
    return exploded.select(
        "doc_id", "word", (F.col("pos0") + 1).cast("int").alias("pos")
    ).filter(F.length("word") > 3)


def _signup_purchase_merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """Per-user merge for q_udf_cogroup: purchases after first signup."""
    if left.empty:
        return pd.DataFrame(
            {"user_id": pd.Series(dtype="int64"),
             "first_signup": pd.Series(dtype="datetime64[us]"),
             "n_purchases": pd.Series(dtype="int64"),
             "avg_delay_s": pd.Series(dtype="float64")}
        )
    l_us = left["ts"].astype("datetime64[us]").astype("int64")
    fs_us = int(l_us.min())
    if right.empty:
        n, avg = 0, None
    else:
        r_us = right["ts"].astype("datetime64[us]").astype("int64")
        delta = r_us[r_us > fs_us] - fs_us
        n = int(delta.size)
        if n:
            # exact half-up rounding to 4 dp in integer µs arithmetic:
            # Python's round() is banker's, the oracle's ROUND is half
            # away from zero — they disagree exactly at ties, and the
            # µs-integer ratio CAN land on one
            den = n * 100  # seconds·1e4 = sum_us / (n·100)
            q, r = divmod(int(delta.sum()), den)
            avg = (q + (1 if 2 * r >= den else 0)) / 1e4
        else:
            avg = None
    return pd.DataFrame(
        {"user_id": [int(left["user_id"].iloc[0])],
         "first_signup": [pd.Timestamp(fs_us, unit="us")],
         "n_purchases": [n],
         "avg_delay_s": [avg]}
    )


@register(
    "q_udf_cogroup",
    oracle=f"""
    WITH s AS (
        SELECT user_id, MIN(ts) AS first_signup
        FROM {EVENTS_US} WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
        SELECT user_id, ts FROM {EVENTS_US} WHERE event_type = 'purchase'
    )
    SELECT s.user_id, s.first_signup,
           COUNT(p.user_id) AS n_purchases,
           ROUND(SUM(EPOCH_US(p.ts) - EPOCH_US(s.first_signup))
                 * 1.0 / COUNT(p.user_id) / 1000000, 4) AS avg_delay_s
    FROM s LEFT JOIN p
      ON p.user_id = s.user_id AND p.ts > s.first_signup
    GROUP BY s.user_id, s.first_signup
    """,
)
def q_udf_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas — the per-key two-stream merge surface:
    each user's signup rows and purchase rows arrive as two aligned
    pandas frames (one Arrow batch each) and arbitrary Python reconciles
    them (here: purchases after first signup, count + mean delay).
    Physically both sides shuffle once on user_id and stream through
    cogrouped Arrow batches — state never exceeds one key's rows, so
    the pattern holds at 100 TB provided keys aren't pathological.
    Delay math stays on exact integer microseconds until the final
    division, mirroring the oracle's EPOCH_US expression shape; the
    logic is deliberately SQL-expressible (min + filtered left join +
    avg) so DuckDB verifies the cogroup machinery itself."""
    # The two sides MUST come from separate relation instances. Deriving
    # both from one `load()` builds a self-cogroup whose analyzer
    # dedup re-aliases the right child but leaves the pandas UDF's
    # right-side argument expressions pointing at LEFT expr-ids; any
    # action that applies column pruning (count(), narrow projections)
    # then drops the right child's unreferenced ts column and the UDF
    # receives a one-column frame (measured on this PySpark: KeyError
    # 'ts' under count(), while collect-style actions work — which is
    # why the hazard stayed invisible to the row-comparing harness).
    signups = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select("user_id", "ts")
    )
    purchases = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
    )
    return (
        signups.groupby("user_id")
        .cogroup(purchases.groupby("user_id"))
        .applyInPandas(
            _signup_purchase_merge,
            # first_signup is timestamp_ntz: the input ts is NTZ and the
            # driver's hasher distinguishes ntz from tz-aware timestamp
            "user_id long, first_signup timestamp_ntz, "
            "n_purchases long, avg_delay_s double",
        )
    )


def _arrow_norms(batches):
    """mapInArrow body for q_udf_arrow: per-batch vector norms without
    pandas — zero-copy list offsets + one reduceat per batch."""
    import numpy as np
    import pyarrow as pa

    for batch in batches:
        ids = batch.column(0)
        emb = batch.column(1)
        if isinstance(emb, pa.ChunkedArray):  # pragma: no cover
            emb = emb.combine_chunks()
        offsets = emb.offsets.to_numpy()
        # float64 BEFORE squaring and a sequential reduceat: identical
        # order of operations to the oracle's list_sum over doubles
        vals = emb.flatten().to_numpy().astype(np.float64)
        sq = vals * vals
        sums = np.add.reduceat(sq, offsets[:-1])
        dims = np.diff(offsets).astype(np.int32)
        yield pa.RecordBatch.from_arrays(
            [
                ids,
                pa.array(dims, type=pa.int32()),
                pa.array(np.round(np.sqrt(sums), 4), type=pa.float64()),
            ],
            names=["vec_id", "dim", "norm"],
        )


@register(
    "q_udf_arrow",
    oracle="""
    SELECT vec_id,
           LEN(embedding) AS dim,
           ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
                 x -> CAST(x AS DOUBLE) * x))), 4) AS norm
    FROM embeddings
    """,
)
def q_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the lowest-overhead Python batch surface: raw Arrow
    RecordBatches in and out, no pandas materialization (the right tier
    for binary/vector payloads where pandas boxing dominates). The body
    reads the list column's offsets zero-copy and computes every norm
    in one vectorized reduceat per batch — no per-row Python. Math is
    float64 with the same left-to-right reduction order as the oracle's
    LIST_SUM, so results are bit-identical. Narrow map: no shuffle,
    parallelism = input splits."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return emb.mapInArrow(_arrow_norms, "vec_id long, dim int, norm double")


@register(
    "q_udtf_python",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               UNNEST(STRING_SPLIT(TRIM(LOWER(text)), ' ')) AS word,
               UNNEST(RANGE(1, LEN(STRING_SPLIT(TRIM(LOWER(text)), ' ')) + 1)) AS pos
        FROM documents
        WHERE doc_id % 10 = 3
    )
    SELECT doc_id, word, CAST(pos AS INTEGER) AS pos,
           CAST(COALESCE(SUM(LENGTH(word) + 1) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS INTEGER) AS start_offset
    FROM w
    """,
)
def q_udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-based Python UDTF (Spark 3.5+/4 `@udtf`): one input row →
    N output rows with imperative per-row state (a running character
    cursor emitting each word's start offset — the tokenizer-alignment
    shape). Invoked through SQL LATERAL correlation against the scan,
    which is the UDTF's native join form. The oracle recovers the same
    offsets relationally with a prefix-sum window.

    Scale note: the UDTF is the *generality* rung of the UDF ladder —
    per-row Python with arbitrary fan-out. It parallelizes per
    partition like any map, but rows cross into Python one at a time;
    when the logic IS SQL-expressible (as the oracle proves here) the
    built-in form wins, and the engine's hot paths reserve UDTFs for
    logic that isn't. The subset filter is pushed below the lateral
    join into the parquet scan.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, word: string, pos: int, start_offset: int")
    class WordOffsets:
        def eval(self, doc_id, text):  # noqa: ANN001 - UDTF contract
            off = 0
            for i, w in enumerate(text.strip().lower().split(" ")):
                yield doc_id, w, i + 1, off
                off += len(w) + 1

    spark.udtf.register("word_offsets", WordOffsets)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT f.doc_id, f.word, f.pos, f.start_offset
        FROM documents d, LATERAL word_offsets(d.doc_id, d.text) f
        WHERE d.doc_id % 10 = 3
        """
    )
