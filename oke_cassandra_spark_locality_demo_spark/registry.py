"""Query registry: each operator from SURVEY §2.3 registers a named
(spark, sf_dir) -> DataFrame callable and, when SQL-expressible, the
equivalent DuckDB oracle SQL. `__spark_entry__.py` exposes this registry
to the driver's correctness harness.

Determinism/parity conventions (FIXTURES.md §"Oracle-parity"):
- alias every computed column identically on both sides;
- explicit ORDER BY before any LIMIT;
- round float aggregates to 4 dp on both sides;
- UTC everywhere.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Oracle-side events relation at microsecond precision. The raw fixture
#: is TIMESTAMP_NS; Spark reads a µs-truncated staging copy
#: (catalog._stage_events_us), and DuckDB must compute on the identically
#: truncated values or sub-µs remainders leak into hashes.
EVENTS_US = (
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, "
    "value, props FROM events)"
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver records rows-only
    doc: str


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with optional oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Oracle parity requires UTC regardless of how the caller
            # (driver harness) configured its session (FIXTURES.md).
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        wrapped.__doc__ = fn.__doc__
        wrapped.__name__ = fn.__name__
        _REGISTRY[name] = QuerySpec(name, wrapped, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def _load_all() -> None:
    """Import every operator module so registrations run."""
    from . import operators, functions, sources, streaming, llm  # noqa: F401
    from .operators import (  # noqa: F401
        scans,
        filters,
        joins,
        aggregates,
        windows,
        sorts,
        setops,
        meta,
        sql_features,
        graph,
    )
    from .functions import scalar, udf  # noqa: F401
    from .sources import ingest, pyds  # noqa: F401
    from .streaming import windows as stream_windows  # noqa: F401
    from .streaming import stateful  # noqa: F401
    from .streaming import joins as stream_joins  # noqa: F401
    from .llm import dedup, similarity, text, multimodal, pipeline, ivf, sampling  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None
    }


def get(name: str) -> QuerySpec:
    _load_all()
    return _REGISTRY[name]
