"""Multi-executor-JVM correctness (opt-in: SPARK_GRAFT_CLUSTER_TESTS=1).

``local[*]`` runs executors as threads in the driver JVM, which hides a
class of bugs: worker-side imports that only resolve via the driver's
process state, broadcasts that accidentally rely on same-JVM object
identity, task-serialization gaps. ``local-cluster[N,cores,mem]`` spawns
REAL executor JVMs through the standalone scheduler — the closest a
single box gets to the 1000-executor topology the engine is designed
for.

The full 204-key contract drive passes under local-cluster[2,8,4096]
(158 s, round 4 — see ROUNDLOG). Running that in CI would double suite
time, so this test drives one representative key per worker-side
surface and is skipped unless explicitly requested.
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_CLUSTER_TESTS") != "1",
    reason="opt-in: set SPARK_GRAFT_CLUSTER_TESTS=1 (spawns executor JVMs)",
)

#: one key per worker-side machinery class
KEYS = [
    "q_agg_hash",          # decimal hash aggregation across JVMs
    "q_join_broadcast",    # broadcast serialization to remote executors
    "q_udf_grouped_agg",   # pandas UDF: package import on executor workers
    "q_udf_cogroup",       # cogrouped Arrow exchange
    "q_source_pyds_scan",  # Python data source instantiated on executors
    "q_stream_tumbling",   # streaming batch-equivalent
]


def test_contract_keys_under_executor_jvms(sf_dir):
    from pyspark.sql import SparkSession

    from oke_cassandra_spark_locality_demo_spark import registry

    # getOrCreate returns any ACTIVE session regardless of the master
    # requested here — running inside the full suite would silently
    # re-test local[*]. This test is meaningful only as the session
    # owner (pytest tests/test_cluster_topology.py).
    existing = SparkSession.getActiveSession()
    if existing is not None and "local-cluster" not in existing.conf.get(
        "spark.master", ""
    ):
        pytest.skip("another session owns this process; run this file alone")

    spark = (
        SparkSession.builder.master("local-cluster[2,4,2048]")
        .appName("cluster-topology")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        spark.sparkContext.setLogLevel("ERROR")
        for key in KEYS:
            assert registry.get(key).fn(spark, sf_dir).count() >= 0, key
    finally:
        spark.stop()
