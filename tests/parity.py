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
        return ("ts", v.replace(tzinfo=None).isoformat())
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
