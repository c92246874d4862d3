"""Sink-side behaviors: partition pruning on the Hive layout, foreachBatch."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from oke_cassandra_spark_locality_demo_spark.catalog import load
from oke_cassandra_spark_locality_demo_spark.plans.inspect import formatted_plan
from oke_cassandra_spark_locality_demo_spark.registry import get
from oke_cassandra_spark_locality_demo_spark.streaming.runtime import events_stream


def test_partition_pruning_on_hive_layout(spark, sf_dir):
    df = get("q_scan_partition_pruned").fn(spark, sf_dir)
    plan = formatted_plan(df)
    # the partition filter must appear as PartitionFilters on the scan,
    # not as a post-scan Filter over all partitions
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1][:200], plan[:2000]


def test_foreachbatch_sink(spark, sf_dir):
    """foreachBatch: the escape hatch for sinks Spark lacks natively
    (JDBC upserts, multi-table writes). Collect per-batch counts through
    a real incremental run."""
    seen: list[int] = []

    def handle(batch_df, batch_id: int) -> None:
        seen.append(batch_df.count())

    ckpt = os.path.join(tempfile.gettempdir(), "graft_feb_ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)
    q = (
        events_stream(spark, sf_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    total = load(spark, sf_dir, "events").count()
    assert sum(seen) == total and len(seen) >= 1
