"""Generate the LOCAL second-decade scaling fixture (VERDICT r11 item 3).

The 100 TB scaling claim rests on the sf0.01 -> sf0.1 decade (10x) plus
code reading; the three watch keys whose full-registry probe ratios sat
highest (q_udf_cogroup, q_topk_per_group, q_join_null_safe) have never
been measured over a SECOND decade. This tool synthesizes an sf1
fixture — 10x sf0.1 — for exactly the tables those keys read (events,
customer, lineitem), preserving the driver fixture's distributional
recipe as measured across sf0.01/sf0.1 (TESTDATA.md is read-only and
the driver's generator is not in-repo, so the recipe is reproduced
from the data itself):

  table     | rows        | key laws (measured sf0.01 -> sf0.1)
  events    | sf * 1e6    | user_id ~ U[0, sf*15000); 5 uniform types;
            |             | ts ~ U over 2024-01-01..01-31; value ~ |N|*
            |             | scaled to mean ~50; props = {"k": U[0,100)}
  customer  | sf * 150e3  | c_custkey sequential; nation U[0,25);
            |             | acctbal U[-1000, 10000); 5 segments
  lineitem  | sf * 6e6    | orderkey U[0, sf*1.5e6); suppkey U[0,
            |             | sf*10e3) (per-group size CONSTANT at ~600
            |             | rows — the law that makes topk_per_group
            |             | sublinear); partkey U[0, sf*200e3);
            |             | linenumber U[1,8); qty U[1,50]; price
            |             | U[900, 105000); discount/tax small grids;
            |             | A/N/R x F/O flags; shipdate U 1995..2001

Wall-time scaling is driven by row counts, group cardinalities and
join-key multiplicity — all preserved exactly; unrelated value noise
(names, prop strings) does not move the probe. Seed discipline: one
numpy default_rng(42) per table, so reruns are byte-stable.

Output: .localdata/sf1/{events,customer,lineitem}.parquet (gitignored —
~160 MB of derived data; regenerate with this tool). Run:
    python tools/make_second_decade_fixture.py [--sf 1.0]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gen_events(sf: float) -> pa.Table:
    n = int(sf * 1_000_000)
    rng = np.random.default_rng(42)
    ts0 = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    span = 30 * 86_400 * 1_000_000  # 30 days in microseconds
    ts = ts0 + rng.integers(0, span, n)
    types = np.array(["click", "error", "purchase", "signup", "view"])
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype="int64")),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(
                rng.integers(0, int(sf * 15_000), n, dtype="int64")
            ),
            "event_type": pa.array(types[rng.integers(0, 5, n)]),
            "value": pa.array(
                np.round(np.abs(rng.normal(0, 62.3, n)), 2)
            ),
            "props": pa.array(
                np.char.add(
                    np.char.add(
                        '{"k": ',
                        rng.integers(0, 100, n).astype("U3"),
                    ),
                    "}",
                )
            ),
        }
    )


def gen_customer(sf: float) -> pa.Table:
    n = int(sf * 150_000)
    rng = np.random.default_rng(42)
    segs = np.array(
        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    )
    keys = np.arange(n, dtype="int64")
    return pa.table(
        {
            "c_custkey": pa.array(keys),
            "c_name": pa.array(
                np.char.add(
                    "Customer#", np.char.zfill(keys.astype("U9"), 9)
                )
            ),
            "c_nationkey": pa.array(
                rng.integers(0, 25, n, dtype="int32")
            ),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-1_000, 10_000, n), 2)
            ),
            "c_mktsegment": pa.array(segs[rng.integers(0, 5, n)]),
        }
    )


def gen_lineitem(sf: float) -> pa.Table:
    n = int(sf * 6_000_000)
    rng = np.random.default_rng(42)
    ship0 = np.datetime64("1995-01-01", "us").astype("int64")
    ship_span_days = 2500
    flags = np.array(["A", "N", "R"])
    status = np.array(["F", "O"])
    return pa.table(
        {
            "l_orderkey": pa.array(
                rng.integers(0, int(sf * 1_500_000), n, dtype="int64")
            ),
            "l_partkey": pa.array(
                rng.integers(0, int(sf * 200_000), n, dtype="int64")
            ),
            "l_suppkey": pa.array(
                rng.integers(0, int(sf * 10_000), n, dtype="int64")
            ),
            "l_linenumber": pa.array(
                rng.integers(1, 8, n, dtype="int32")
            ),
            "l_quantity": pa.array(
                rng.integers(1, 51, n).astype("float64")
            ),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(900, 105_000, n), 2)
            ),
            "l_discount": pa.array(
                np.round(rng.integers(0, 11, n) / 100.0, 2)
            ),
            "l_tax": pa.array(np.round(rng.integers(0, 9, n) / 100.0, 2)),
            "l_returnflag": pa.array(flags[rng.integers(0, 3, n)]),
            "l_linestatus": pa.array(status[rng.integers(0, 2, n)]),
            "l_shipdate": pa.array(
                (
                    ship0
                    + rng.integers(0, ship_span_days, n)
                    * 86_400
                    * 1_000_000
                ).astype("datetime64[us]")
            ),
        }
    )


#: the driver documents fixture's exact 31-word vocabulary (measured —
#: identical at sf0.01 and sf0.1, shared by all five lang labels)
_DOC_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]


def gen_documents(sf: float) -> pa.Table:
    """Bag-of-words docs reproducing the measured near-dup law: word
    count U[10,100] over the fixed 31-word vocab; ~5% of docs are a
    planted near-dup of a random earlier doc. The driver's
    perturbation is an APPEND of k vocab words at the END of the copy
    (measured exactly at sf0.1: all 256 near-dup pairs classify as
    append_1 x243 / exact x8 / append_2 x4 / append_3 x1 — no
    substitutions, no internal insertions), which preserves every
    original shingle (jaccard = (L-2)/(L-1+k) for a 1-append, >=0.89
    even on the shortest docs — reproducing the 249-of-256 >=0.9
    profile at UNIFORM source lengths, which random-position edits
    cannot) and the mostly-pairs cluster-size law. lang/source labels
    as measured (en ~41%, rest ~15% each; 20 uniform sources; all
    langs share the one vocab)."""
    n = int(sf * 50_000)
    rng = np.random.default_rng(42)
    vocab = np.array(_DOC_VOCAB)
    langs = np.array(["en", "zh", "es", "de", "fr"])
    lang_p = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
    texts: list[str] = []
    words: list[list[str]] = []
    for i in range(n):
        if i > 0 and rng.random() < 0.051:
            k = rng.choice(4, p=[0.031, 0.949, 0.016, 0.004])
            w = list(words[rng.integers(0, i)]) + [
                str(v) for v in vocab[rng.integers(0, len(vocab), k)]
            ]
        else:
            w = list(vocab[rng.integers(0, len(vocab), rng.integers(10, 101))])
        words.append(w)
        texts.append(" ".join(w))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype="int64")),
            "text": pa.array(texts),
            "lang": pa.array(langs[rng.choice(5, n, p=lang_p)]),
            "source": pa.array(
                np.char.add("src", rng.integers(0, 20, n).astype("U2"))
            ),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype="int64")
            ),
        }
    )


def gen_embeddings(sf: float) -> pa.Table:
    """Unit-norm 64-dim float vectors, 10 uniform labels. The driver
    fixture's count law is x4 per decade (500 -> 2000 measured), NOT
    x10 — preserved here (sf1 -> 8000); vectors are isotropic (the
    measured intra/inter-label cosine are both ~0: labels carry no
    cluster structure)."""
    n = int(8000 * (sf / 1.0) ** 0.60206)  # x4/decade: 4 = 10^0.60206
    rng = np.random.default_rng(42)
    v = rng.standard_normal((n, 64)).astype("float32")
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype="int64")),
            "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n, dtype="int32")),
        }
    )


def gen_orders(sf: float) -> pa.Table:
    """Measured laws: sequential keys; custkey uniform over the
    customer keyspace; status P/O/F uniform thirds (the fixture's law,
    not TPC-H's); totalprice U[1000, 500000); orderdate uniform
    1995-01-01 .. 2001-08-01 (year histogram flat, 2001 partial);
    5 uniform priorities."""
    n = int(sf * 1_500_000)
    rng = np.random.default_rng(42)
    d0 = np.datetime64("1995-01-01", "us").astype("int64")
    span_days = 2404  # 1995-01-01 .. 2001-08-01 inclusive-ish
    prios = np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    )
    return pa.table(
        {
            "o_orderkey": pa.array(np.arange(n, dtype="int64")),
            "o_custkey": pa.array(
                rng.integers(0, int(sf * 150_000), n, dtype="int64")
            ),
            "o_orderstatus": pa.array(
                np.array(["O", "P", "F"])[rng.integers(0, 3, n)]
            ),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1_000, 500_000, n), 2)
            ),
            "o_orderdate": pa.array(
                (
                    d0
                    + rng.integers(0, span_days, n) * 86_400 * 1_000_000
                ).astype("datetime64[us]")
            ),
            "o_orderpriority": pa.array(prios[rng.integers(0, 5, n)]),
        }
    )


def gen_part(sf: float) -> pa.Table:
    """Measured laws: sequential keys; name = adjective(8) + noun(8)
    uniform; Brand#1..25 uniform; 6 uniform types; size U[1,50];
    retailprice = 900 + (key % 1000)/10 exactly (fixture law,
    verified at keys 0-4 and the 999.9 max)."""
    n = int(sf * 200_000)
    rng = np.random.default_rng(42)
    adjs = np.array(
        ["new", "red", "blue", "old", "small", "cold", "large", "hot"]
    )
    nouns = np.array(
        ["widget", "anvil", "gizmo", "bolt", "plate", "rod", "ring", "gear"]
    )
    types = np.array(
        ["LARGE", "STANDARD", "SMALL", "ECONOMY", "PROMO", "MEDIUM"]
    )
    keys = np.arange(n, dtype="int64")
    return pa.table(
        {
            "p_partkey": pa.array(keys),
            "p_name": pa.array(
                np.char.add(
                    np.char.add(adjs[rng.integers(0, 8, n)], " "),
                    nouns[rng.integers(0, 8, n)],
                )
            ),
            "p_brand": pa.array(
                np.char.add(
                    "Brand#", rng.integers(1, 26, n).astype("U2")
                )
            ),
            "p_type": pa.array(types[rng.integers(0, 6, n)]),
            "p_size": pa.array(rng.integers(1, 51, n, dtype="int32")),
            "p_retailprice": pa.array(
                np.round(900.0 + (keys % 1000) / 10.0, 1)
            ),
        }
    )


def gen_supplier(sf: float) -> pa.Table:
    n = int(sf * 10_000)
    rng = np.random.default_rng(42)
    keys = np.arange(n, dtype="int64")
    return pa.table(
        {
            "s_suppkey": pa.array(keys),
            "s_name": pa.array(
                np.char.add(
                    "Supplier#", np.char.zfill(keys.astype("U9"), 9)
                )
            ),
            "s_nationkey": pa.array(
                rng.integers(0, 25, n, dtype="int32")
            ),
            "s_acctbal": pa.array(
                np.round(rng.uniform(-1_000, 10_000, n), 2)
            ),
        }
    )


def copy_constant_tables(out_dir: str) -> None:
    """nation/region are scale-constant (25/5 rows at every driver
    SF) — carry the driver fixture's own rows so name-joining TPC-H
    queries (q7/q8/...) see identical dimension content."""
    src = "/root/testdata/sf0.1"
    for t in ("nation", "region"):
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        pq.write_table(
            tbl, os.path.join(out_dir, f"{t}.parquet"), compression="snappy"
        )
        print(f"  {t}: {tbl.num_rows} rows (copied, scale-constant)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    args = ap.parse_args()
    out_dir = os.path.join(ROOT, ".localdata", f"sf{args.sf:g}")
    os.makedirs(out_dir, exist_ok=True)
    copy_constant_tables(out_dir)
    for name, gen in (
        ("events", gen_events),
        ("customer", gen_customer),
        ("lineitem", gen_lineitem),
        ("documents", gen_documents),
        ("embeddings", gen_embeddings),
        ("orders", gen_orders),
        ("part", gen_part),
        ("supplier", gen_supplier),
    ):
        path = os.path.join(out_dir, f"{name}.parquet")
        tbl = gen(args.sf)
        pq.write_table(tbl, path, compression="snappy")
        mb = os.path.getsize(path) / 1e6
        print(f"  {name}: {tbl.num_rows:,} rows -> {path} ({mb:.0f} MB)")
    print(f"second-decade fixture ready at {out_dir}")


if __name__ == "__main__":
    main()
