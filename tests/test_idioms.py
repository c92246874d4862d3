"""Cross-engine property tests for the repo's portable-numeric IDIOMS.

Every oracle-parity convention the operators lean on is an empirical
claim about Spark-vs-DuckDB bit behavior; these tests probe each claim
on randomized inputs (seeded — the fixtures only exercise one data
shape) so a Spark or DuckDB upgrade that breaks a convention fails HERE
with a named idiom, not as a mystery hash-fail in some operator:

1. md5-prefix bucket hash:   Spark conv(substring(md5 ...)) ==
   DuckDB ('0x'||SUBSTRING(MD5 ...))::UBIGINT == python int(md5[:8],16)
2. identical-IEEE-expression: the Pearson-style micro emission over
   exact int64 scalars is bit-equal across engines (the green class
   q_ts_autocorr / q_stats_welch_ttest / q_graph_assortativity use)
3. truncating integer division: Spark DIV == DuckDB // on signed ints
4. TPUT certificate soundness: certified prune == exact top-k on
   randomized skew shapes (q_agg_heavy_hitters' safety property)
"""

from __future__ import annotations

import hashlib
import random

import duckdb
import pytest


def test_md5_bucket_hash_three_way(spark):
    rng = random.Random(7)
    strings = [
        "".join(rng.choice("abcdefghij0123456789-_/#|") for _ in range(rng.randint(1, 24)))
        for _ in range(64)
    ]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got_spark = {
        r.s: r.h
        for r in df.selectExpr(
            "s",
            "CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT) AS h",
        ).collect()
    }
    con = duckdb.connect()
    got_duck = dict(
        con.execute(
            "SELECT s, CAST(('0x' || SUBSTRING(MD5(s), 1, 8))::UBIGINT AS BIGINT)"
            " FROM (SELECT UNNEST(?) AS s)",
            [strings],
        ).fetchall()
    )
    for s in strings:
        ref = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
        assert got_spark[s] == ref, s
        assert got_duck[s] == ref, s


_PEARSON_MICRO = """
CAST(ROUND(1000000.0 * (
    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
) / (
    SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
    * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
), 0) AS BIGINT)
"""


def test_identical_ieee_expression_bit_parity(spark):
    """Random exact-int64 moment scalars through the SAME Pearson micro
    expression must emit identical integers in both engines (the *, -,
    /, SQRT, scale-0-ROUND green class)."""
    rng = random.Random(13)
    rows = []
    for i in range(300):
        n = rng.randint(2, 5000)
        xs = [rng.randint(-10**6, 10**6) for _ in range(8)]
        ys = [x + rng.randint(-10**5, 10**5) for x in xs]
        # moments from a plausible joint sample, scaled up — keeps the
        # denominator strictly positive and magnitudes realistic
        k = n // 8 + 1
        sx = sum(xs) * k
        sy = sum(ys) * k
        sxx = sum(x * x for x in xs) * k
        syy = sum(y * y for y in ys) * k
        sxy = sum(x * y for x, y in zip(xs, ys)) * k
        rows.append((i, n * k * 8, sx, sy, sxx, syy, sxy))
    df = spark.createDataFrame(
        rows, "id long, n long, sx long, sy long, sxx long, syy long, sxy long"
    )
    got_spark = {
        r.id: r.m
        for r in df.selectExpr("id", _PEARSON_MICRO + " AS m").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (id BIGINT, n BIGINT, sx BIGINT, sy BIGINT,"
        " sxx BIGINT, syy BIGINT, sxy BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?,?,?)", rows)
    got_duck = dict(
        con.execute(f"SELECT id, {_PEARSON_MICRO} FROM t").fetchall()
    )
    assert got_spark == got_duck


def test_signed_integer_division_truncates_identically(spark):
    rng = random.Random(29)
    rows = [
        (i, rng.randint(-10**12, 10**12), rng.choice([1, 3, 7, 196, 10**6]))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got_spark = {
        r.id: r.q for r in df.selectExpr("id", "a DIV b AS q").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    got_duck = dict(con.execute("SELECT id, a // b FROM t").fetchall())
    for i, a, b in rows:
        trunc = abs(a) // abs(b) * (1 if (a >= 0) == (b >= 0) else -1)
        assert got_spark[i] == trunc, (a, b, got_spark[i])
        assert got_duck[i] == trunc, (a, b, got_duck[i])


@pytest.mark.parametrize("seed", [3, 17, 99])
def test_tput_certificate_soundness_randomized(spark, seed):
    """On randomized partial-count tables, whenever the prune CERTIFIES,
    its answer must equal the exact top-k computed independently."""
    from collections import Counter

    from oke_cassandra_spark_locality_demo_spark.llm.text import (
        exact_topk_candidate_prune,
    )

    rng = random.Random(seed)
    shards = rng.randint(2, 6)
    items = [f"w{i}" for i in range(rng.randint(10, 60))]
    heavy = rng.sample(items, rng.randint(0, 3))
    rows = []
    for s in range(shards):
        for it in items:
            base = rng.randint(0, 4)
            if it in heavy:
                base += rng.randint(50, 200)
            if base:
                rows.append((s, it, base))
    partial = spark.createDataFrame(rows, "shard int, item string, pc long")
    k, m = 5, 8
    res, certified = exact_topk_candidate_prune(partial, k=k, m=m)
    got = [(r.item, r.cnt) for r in res.collect()]
    totals = Counter()
    for _, it, pc in rows:
        totals[it] += pc
    exact = sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    if certified:
        assert got == exact, (seed, got, exact)
    else:
        # the fallback path must be exact regardless
        assert got == exact, (seed, got, exact)
