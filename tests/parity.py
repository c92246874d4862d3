"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same fixtures,
then compares row count, column names, and order-insensitive values.

Faithfulness contract (round-2 hardening, per VERDICT r1 §What's-wrong 3):
the driver hashes EXACT values with a pandas-based canonicalizer that
(a) does NOT round floats — bit-equality or bust — and (b) CRASHES with
``TypeError: unhashable type`` on array/map-typed output columns
(pandas ``factorize`` during ``sort_values``). This mirror reproduces
both behaviors: floats compare bit-exact, and any list/dict value in an
oracle-backed result raises ``ComplexTypeHazard`` so the local suite
fails loudly *before* the driver does. Queries with array outputs must
stringify them (``array_join``/``to_json``) on both sides.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    return con


class ComplexTypeHazard(TypeError):
    """An array/map-typed output column reached the compare layer.

    The driver's pandas hasher dies with ``unhashable type: 'list'`` on
    these (CORRECTNESS_r01: q_agg_distinct, q_agg_collect_sorted), so
    the mirror refuses them instead of silently tuple-izing."""


class TzAwareHazard(TypeError):
    """A tz-aware ``timestamp`` output column reached the compare layer.

    Every driver-green timestamp-emitting query outputs ``timestamp_ntz``
    and the driver's hasher distinguishes the two (CORRECTNESS_r02:
    q_agg_incremental matched value-for-value locally yet hash-failed the
    driver because ``date_trunc`` had promoted its month column to
    tz-aware). The mirror refuses tz-aware outputs instead of stripping
    tzinfo — cast to ``timestamp_ntz`` (UTC session → value-exact)."""


def assert_no_tz_aware(spark_df) -> None:
    """Fail on any tz-aware TimestampType in the output schema."""
    from pyspark.sql import types as T

    def walk(dt, path):
        if isinstance(dt, T.TimestampType):
            raise TzAwareHazard(
                f"output column {path!r} is tz-aware timestamp — the driver "
                "hasher distinguishes it from timestamp_ntz; cast with "
                ".cast('timestamp_ntz') (session tz is UTC, value-exact)"
            )
        if isinstance(dt, T.StructType):
            for f in dt.fields:
                walk(f.dataType, f"{path}.{f.name}")
        elif isinstance(dt, T.ArrayType):
            walk(dt.elementType, path + "[]")
        elif isinstance(dt, T.MapType):
            walk(dt.keyType, path + ".key")
            walk(dt.valueType, path + ".value")

    for f in spark_df.schema.fields:
        walk(f.dataType, f.name)


def _canon(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        # Exact: the driver hashes raw values. A query whose floats only
        # agree to N decimal places WILL fail the driver's hash.
        return ("f", v)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            raise TzAwareHazard(
                f"tz-aware datetime {v!r} would hash-mismatch the driver "
                "(it distinguishes timestamp from timestamp_ntz) — cast "
                "the column to timestamp_ntz on the Spark side"
            )
        return ("ts", v.isoformat())
    if isinstance(v, date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple, dict, set)):
        raise ComplexTypeHazard(
            f"complex-typed value {v!r} would crash the driver's pandas "
            "hasher (unhashable type) — stringify with array_join/to_json "
            "in BOTH the Spark query and the oracle SQL"
        )
    if isinstance(v, bytearray):
        return ("by", bytes(v))
    return (type(v).__name__, v)


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon(r[i]) for i in idx) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


def compare(spark_df, con, oracle: str, limit: int | None = None) -> tuple[bool, str]:
    assert_no_tz_aware(spark_df)
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = [c.lower() for c in spark_df.columns]
    o = con.execute(oracle)
    o_cols = [d[0].lower() for d in o.description]
    o_rows = o.fetchall()

    if sorted(s_cols) != sorted(o_cols):
        return False, f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}"
    ss, oo = _rowset(s_cols, s_rows), _rowset(o_cols, o_rows)
    if ss != oo:
        diffs = [(a, b) for a, b in zip(ss, oo) if a != b][:3]
        return False, f"values differ; first diffs (spark vs oracle): {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
