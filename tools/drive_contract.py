"""Drive the spark-graft driver contract the way the external harness
does: a PLAIN SparkSession (no engine confs — probes the session-conf
hardening in registry.register's wrapper), sf0.01, every queries()
entry compared to oracle_sql() via tests/parity.compare. Exits non-zero
on any mismatch. This is the verification entry point the project's
verify skill runs after every change batch.

Usage:
    python tools/drive_contract.py          # sf0.01 (driver scale)
    SPARK_GRAFT_DRIVE_SF=/root/testdata/sf0.1 python tools/drive_contract.py
"""
import os
import sys, time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))
from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod
from tests.parity import compare, duckdb_conn

spark = (SparkSession.builder.master("local[16]")
         .config("spark.sql.shuffle.partitions", "16")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

df = entry_mod.entry(spark)
n = df.count()
assert n > 0, "entry() returned 0 rows"
print(f"[entry] {n} rows, schema: {df.schema.simpleString()[:100]}")

sf = os.environ.get("SPARK_GRAFT_DRIVE_SF", "/root/testdata/sf0.01")
qs = entry_mod.queries()
oracles = entry_mod.oracle_sql()
con = duckdb_conn(sf)
ok_n = 0; fails = []
t0 = time.time()
for name, fn in qs.items():
    if name not in oracles:
        try:
            cnt = fn(spark, sf).count()
            if cnt > 0:
                ok_n += 1
            else:
                fails.append((name, "rows-only returned 0 rows"))
        except Exception as e:
            fails.append((name, f"rows-only ERR {e}"))
        continue
    try:
        ok, msg = compare(fn(spark, sf), con, oracles[name])
    except Exception as e:
        ok, msg = False, f"ERR {type(e).__name__}: {e}"
    if ok: ok_n += 1
    else: fails.append((name, msg))
print(f"[t2-mirror] {ok_n}/{len(qs)} in {time.time()-t0:.0f}s")
for name, msg in fails:
    print(f"  FAIL {name}: {str(msg)[:300]}")
sys.exit(1 if fails else 0)
