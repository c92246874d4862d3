"""Plan-shape assertions (SURVEY §5.2(c)): the testable proxies for the
reference's pushdown/pruning/locality claims (§4.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oke_cassandra_spark_locality_demo_spark.catalog import load
from oke_cassandra_spark_locality_demo_spark.conf import co_partition
from oke_cassandra_spark_locality_demo_spark.plans.inspect import (
    count_exchanges,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)
from oke_cassandra_spark_locality_demo_spark.registry import get


def test_predicate_pushdown_reaches_parquet(spark, sf_dir):
    df = get("q_scan_pushdown").fn(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed and "l_quantity" in pushed, pushed


def test_column_pruning(spark, sf_dir):
    df = get("q_scan_prune_cols").fn(spark, sf_dir)
    cols = read_schema_columns(df)
    assert set(cols) == {"l_orderkey", "l_quantity", "l_shipdate"}, cols


def test_broadcast_join_no_fact_shuffle(spark, sf_dir):
    df = get("q_join_broadcast").fn(spark, sf_dir)
    assert has_broadcast_join(df)
    # only the final groupBy may shuffle the fact side: ≤1 hash exchange
    assert count_exchanges(df) <= 1


def test_copartitioned_join_single_aligned_exchange(spark, sf_dir):
    """The B2/B6 locality analog: with both sides repartitioned on the
    key, the join adds no exchange beyond the two explicit repartitions."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    o2, l2 = co_partition(o, l, "o_orderkey")
    joined = o2.join(l2, "o_orderkey")
    assert count_exchanges(joined) == 2  # exactly the two repartitions


def test_topk_uses_take_ordered(spark, sf_dir):
    from oke_cassandra_spark_locality_demo_spark.plans.inspect import simple_plan

    df = get("q_topk").fn(spark, sf_dir)
    assert "TakeOrderedAndProject" in simple_plan(df)


def test_scan_full_has_no_shuffle(spark, sf_dir):
    df = get("q_scan_full").fn(spark, sf_dir)
    assert count_exchanges(df) == 0
