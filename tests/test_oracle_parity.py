"""Every oracle-backed query must match DuckDB on the test fixture —
the local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from oke_cassandra_spark_locality_demo_spark import registry
from .parity import assert_no_tz_aware, compare, duckdb_conn

_ALL = sorted(registry.all_oracles())


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", _ALL)
def test_parity(name, spark, sf_dir, con):
    spec = registry.get(name)
    ok, msg = compare(spec.fn(spark, sf_dir), con, spec.oracle)
    assert ok, f"{name}: {msg}"


def test_rows_only_queries_run(spark, sf_dir):
    rows_only = sorted(set(registry.all_queries()) - set(registry.all_oracles()))
    for name in rows_only:
        df = registry.get(name).fn(spark, sf_dir)
        # rows-only queries still go through the driver's schema record:
        # tz-aware timestamps are a hazard there exactly as in parity
        assert_no_tz_aware(df)
        assert df.count() >= 0, name
