"""Builder-side full-registry timing sweep (not part of the driver
contract — bench.py is the graded surface; this exists to catch perf
regressions in the other ~170 keys and to rank optimization targets).

Usage:
    python tools/bench_all.py [sf_dir] [out.json]

Times ONE execution of every registered query (count() action) on the
engine session after a warm-up touch of the LLM tables, and writes
{key: seconds} sorted slowest-first. Single-shot timings swing with
ambient load — treat >1.5x deltas vs a stored baseline as signal, not
the third decimal.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oke_cassandra_spark_locality_demo_spark import registry  # noqa: E402
from oke_cassandra_spark_locality_demo_spark.catalog import load  # noqa: E402
from oke_cassandra_spark_locality_demo_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else None
    spark = build_session(app_name="bench-all")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        load(spark, sf_dir, t).count()

    timings: dict[str, float] = {}
    qs = registry.all_queries()
    t_start = time.time()
    for i, (name, fn) in enumerate(qs.items()):
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERR {type(exc).__name__}: {exc}", file=sys.stderr)
            timings[name] = -1.0
        if (i + 1) % 25 == 0:
            print(
                f"... {i + 1}/{len(qs)} ({time.time() - t_start:.0f}s)",
                file=sys.stderr,
            )

    ranked = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
    doc = {
        "sf_dir": sf_dir,
        "total_sec": round(sum(v for v in ranked.values() if v > 0), 1),
        "timings": ranked,
    }
    line = json.dumps(doc)
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
