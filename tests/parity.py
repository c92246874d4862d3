"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same fixtures,
then compares row count, column names, and order-insensitive values
(floats to a tight tolerance — the engine aims for bit-equality; the
tolerance only forgives sub-ulp formatting noise).
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


def _canon(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", round(v, 9))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon(x) for x in v))
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
