"""Cross-engine drive of an explicit SUBSET of registry keys at a
chosen scale — the building block for targeted sweeps the full
drive_contract.py run doesn't label: pre-adjudication checks of an
upcoming rotation block, multi-scale coverage of a named key list,
or a quick re-grade after a localized change.

Keys come from argv; ``--remaining`` substitutes the current
never-adjudicated set (tools/rotation_remaining.py's list), which is
exactly the r10 rotation tail while the rotation is still live.
Rows-only keys (no oracle_sql entry) get the same >0-rows check the
external driver applies.

Usage:
    python tools/drive_subset.py q_ts_wau q_win_rsi
    python tools/drive_subset.py --remaining
    SPARK_GRAFT_SUBSET_SF=/root/testdata/sf0.001 \
        python tools/drive_subset.py --remaining
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

SF_DIR = os.environ.get("SPARK_GRAFT_SUBSET_SF", "/root/testdata/sf0.01")


def _remaining_keys() -> list[str]:
    from oke_cassandra_spark_locality_demo_spark import registry

    adjudicated = set(registry._DRIVER_ADJUDICATED)
    return [k for k in registry.all_queries() if k not in adjudicated]


def main() -> None:
    args = sys.argv[1:]
    if not args:
        print("usage: drive_subset.py KEY [KEY ...] | --remaining",
              file=sys.stderr)
        sys.exit(2)
    if args == ["--remaining"]:
        keys = _remaining_keys()
    elif "--remaining" in args:
        print("--remaining cannot be combined with explicit keys",
              file=sys.stderr)
        sys.exit(2)
    else:
        keys = args

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from tests.parity import compare, duckdb_conn

    qs = entry_mod.queries()
    unknown = [k for k in keys if k not in qs]
    if unknown:
        print(f"unknown keys: {' '.join(unknown)}", file=sys.stderr)
        sys.exit(2)

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    oracles = entry_mod.oracle_sql()
    con = duckdb_conn(SF_DIR)
    fails = []
    t0 = time.time()
    for name in keys:
        try:
            if name in oracles:
                ok, msg = compare(qs[name](spark, SF_DIR), con,
                                  oracles[name])
            else:
                cnt = qs[name](spark, SF_DIR).count()
                ok, msg = cnt > 0, f"rows-only returned {cnt} rows"
        except Exception as e:  # noqa: BLE001 — report, don't mask
            ok, msg = False, f"ERR {type(e).__name__}: {e}"
        print(f"  {'ok  ' if ok else 'FAIL'} {name}"
              + ("" if ok else f": {str(msg)[:200]}"))
        if not ok:
            fails.append(name)
    verdict = "green" if not fails else f"{len(fails)} FAIL"
    print(f"[subset @ {SF_DIR}] {len(keys) - len(fails)}/{len(keys)} "
          f"{verdict} in {time.time() - t0:.0f}s")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
