#!/usr/bin/env python
"""Isolated micro-bench for named registry queries at $SPARK_GRAFT_SF_DIR
(default sf0.1), same warm-session count-action methodology as bench.py
(min-of-N over REPEATS), labelled via setJobDescription so a UI/event-log
reading maps jobs to queries.

Usage:
    python tools/microbench.py [-n REPEATS] q_dedup_simhash q_tpch_q21 ...

Prints one line per query: name, min, all samples. This is a builder-side
measurement tool; the driver contract lives in bench.py unchanged.
"""
from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from oke_cassandra_spark_locality_demo_spark import registry
from oke_cassandra_spark_locality_demo_spark.session import build_session


def main() -> None:
    args = sys.argv[1:]
    repeats = 5
    if args and args[0] == "-n":
        repeats = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="microbench-r13")
    qs = registry.all_queries()
    # same warmup discipline as bench.py: JVM + Arrow worker pool + table
    # open costs are session setup, not steady-state throughput
    qs["q_flagship_pricing_summary"](spark, "/root/testdata/sf0.001").count()
    qs["q_sim_knn_blas"](spark, "/root/testdata/sf0.001").count()
    from oke_cassandra_spark_locality_demo_spark.catalog import load as _load

    for t in ("events", "documents", "embeddings"):
        _load(spark, sf_dir, t).count()

    for name in names:
        fn = qs[name]
        samples = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"{name} [{i}]")
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(f"{name}\tmin={min(samples):.3f}\t{samples}")
    spark.stop()


if __name__ == "__main__":
    main()
