"""Fixture catalog: parquet tables as DataFrames + temp views.

Reference analog: the Cassandra keyspace/table + schema-inference-at-load
path (`spark.read.format("org.apache.spark.sql.cassandra")…load()`,
/root/reference/userdata/cloudinit.sh:346-349). Parquet is self-describing
the same way; the keyspace maps to the session catalog's temp-view
namespace (SURVEY §1.2).

Also provides the 3-row `users` mirror of `testks.users`
(/root/reference/userdata/cloudinit.sh:306-314) as the Layer-A smoke
fixture.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: All driver-generated fixture tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables — always broadcast-eligible at any SF
#: (region 5 rows, nation 25, supplier ~10/SF; SURVEY §2.2 B5 analog).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})

USERS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
    ]
)

#: Mirror of testks.users rows (reference userdata/cloudinit.sh:312-314).
USERS_ROWS = [
    (1, "Alice", "alice@example.com"),
    (2, "Bob", "bob@example.com"),
    (3, "Charlie", "charlie@example.com"),
]


def _stage_events_us(sf_dir: str) -> str:
    """The events fixture carries TIMESTAMP(NANOS) — a parquet type
    Spark's reader rejects outright. Stage a microsecond-truncated copy
    (pyarrow cast, same truncation DuckDB applies when casting
    TIMESTAMP_NS → TIMESTAMP) once per sf_dir; idempotent and atomic."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(tempfile.gettempdir(), "spark_graft_events", tag)
    out = os.path.join(out_dir, "events.parquet")
    if not os.path.exists(out):
        os.makedirs(out_dir, exist_ok=True)
        t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
        ts_us = t["ts"].cast(pa.timestamp("us"), safe=False)
        t = t.set_column(t.schema.get_field_index("ts"), "ts", ts_us)
        # PID-suffixed tmp: two processes staging the same sf_dir
        # concurrently each write their own tmp, and whichever
        # os.replace lands last wins atomically — the old shared
        # ".tmp" path let their writes interleave (r10 hardening,
        # same audit as workdir.py)
        tmp = f"{out}.tmp.{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, out)
    return out


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Schema comes from the parquet footer
    (self-describing, the analog of connector schema inference)."""
    if name == "events":
        return spark.read.parquet(_stage_events_us(sf_dir))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def users_df(spark: SparkSession) -> DataFrame:
    """The reference's `testks.users` table as an in-memory DataFrame."""
    return spark.createDataFrame(USERS_ROWS, USERS_SCHEMA)


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table (plus `users`) as a temp view so both
    the DataFrame API and ``spark.sql`` address the same catalog."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    u = users_df(spark)
    u.createOrReplaceTempView("users")
    out["users"] = u
    return out
