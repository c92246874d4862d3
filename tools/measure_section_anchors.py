"""Measure idle-host per-query anchors for bench.py's SECONDARY suites
(VERDICT r10 item 1).

Methodology mirrors the sections' own per-round measurement discipline
(min-of-2 per query) the same way the r6 headline re-baseline mirrored
min-of-5: N_RUNS independent full passes over the tpch + llm suites,
anchor = per-query MEDIAN of the runs' min-of-2 values — the expected
value of exactly the measurement each later round produces, not the
cross-run floor (comparing a 2-sample min against a 6-sample floor
re-introduces the bias the r6 note documents).

Run on an idle host (the bench gate's wait_until_idle is reused) at
sf0.1, then paste the printed dict literals into bench.py's
ANCHOR_TPCH_SF01 / ANCHOR_LLM_SF01. Re-run after ANY change to a
section query's implementation — these are drift anchors for the
CURRENT code, not progress anchors.

CONTEXT CAVEAT (measured r11, and why the committed anchors were NOT
produced by this tool alone): section timings are context-sensitive
to the session state bench.py accumulates before reaching them —
q_graph_kcore times 0.56 s in this tool's fresh-session loop but
~3.3 s at its real bench position after 5×headline + 2×tpch (caches,
broadcasts, JVM heap aging). The committed anchors are therefore the
per-query MEDIAN over three contended-false FULL `python bench.py`
runs (splice from the saved BENCH_DETAIL.json of each). Use this tool
for quick relative comparisons of section queries, not for anchor
re-baselining.

Usage:
    python tools/measure_section_anchors.py [N_RUNS]
"""

import os
import statistics
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import bench  # noqa: E402
from oke_cassandra_spark_locality_demo_spark import registry  # noqa: E402
from oke_cassandra_spark_locality_demo_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    load = bench.wait_until_idle()
    print(f"[anchors] gate opened at loadavg {load:.2f}", file=sys.stderr)
    spark = build_session(app_name="spark-graft-anchor-measure")
    queries = registry.all_queries()

    # same warm-up discipline as bench.main: JVM/codegen + Arrow pool +
    # per-table one-time open costs are setup, not steady state
    queries["q_flagship_pricing_summary"](spark, "/root/testdata/sf0.001").count()
    queries["q_sim_knn_blas"](spark, "/root/testdata/sf0.001").count()
    from oke_cassandra_spark_locality_demo_spark.catalog import load as _load

    for t in ("events", "documents", "embeddings"):
        _load(spark, SF_DIR, t).count()

    tpch_names = sorted(
        (q for q in queries if q.startswith("q_tpch_q")),
        key=lambda s: int(s[len("q_tpch_q"):]),
    )
    runs: dict[str, list[dict[str, float]]] = {"tpch": [], "llm": []}
    for i in range(n_runs):
        print(f"[anchors] run {i + 1}/{n_runs}", file=sys.stderr)
        runs["tpch"].append(
            bench.time_suite(spark, queries, tpch_names, SF_DIR, 2)
        )
        runs["llm"].append(
            bench.time_suite(spark, queries, bench.LLM_SECONDARY, SF_DIR, 2)
        )

    for section, names in (("tpch", tpch_names), ("llm", bench.LLM_SECONDARY)):
        med = {
            q: round(
                statistics.median(r[q] for r in runs[section] if r[q] > 0), 3
            )
            for q in names
            if any(r.get(q, -1) > 0 for r in runs[section])
        }
        print(f"ANCHOR_{section.upper()}_SF01 = {{")
        for q, v in med.items():
            print(f'    "{q}": {v},')
        print("}")
    spark.stop()


if __name__ == "__main__":
    main()
