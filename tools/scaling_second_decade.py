"""Two-decade scaling probe for the watch keys (VERDICT r11 item 3).

SCALING_PROBE_FULL measures one 10x step (sf0.01 -> sf0.1); the three
keys whose ratios sat highest there (q_udf_cogroup ~5x,
q_topk_per_group ~3-4x, q_join_null_safe ~4.5x) have been
variance-adjudicated but never probed over a SECOND decade — one step
cannot distinguish "sublinear with overhead" from the onset of a
quadratic term. This tool times them at sf0.01 / sf0.1 (driver
fixtures) AND sf1 (the local .localdata/sf1 fixture from
tools/make_second_decade_fixture.py, distribution-faithful for exactly
the tables these keys read) and reports BOTH decade ratios.

Reading the output: a genuinely linear operator shows ratio2 <= ~10
with ratio2 typically ABOVE ratio1 (fixed overhead amortizes away as
data grows); a quadratic term shows ratio2 >> ratio1 and above the
SUPERLINEAR gate. Exit non-zero if any second-decade ratio exceeds
scaling_probe.SUPERLINEAR_RATIO (14).

Run AFTER generating the fixture:
    python tools/make_second_decade_fixture.py
    python tools/scaling_second_decade.py [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oke_cassandra_spark_locality_demo_spark import registry
from oke_cassandra_spark_locality_demo_spark.session import build_session

from tools.scaling_probe import SUPERLINEAR_RATIO, time_query

WATCH_KEYS = ["q_udf_cogroup", "q_topk_per_group", "q_join_null_safe"]
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIRS = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(ROOT, ".localdata", "sf1")),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--keys", nargs="+", default=None)
    ap.add_argument(
        "--suite",
        choices=["watch", "bench"],
        default="watch",
        help="watch = the three r11 watch keys; bench = the full "
        "headline+tpch+llm probe suite (the r12 full-fixture sweep)",
    )
    args = ap.parse_args()
    if args.keys is None:
        if args.suite == "bench":
            from bench import HEADLINE, LLM_SECONDARY

            args.keys = list(
                dict.fromkeys(
                    HEADLINE
                    + [f"q_tpch_q{i}" for i in range(1, 23)]
                    + LLM_SECONDARY
                )
            )
        else:
            args.keys = WATCH_KEYS
    sf1_dir = SF_DIRS[-1][1]
    if not os.path.isdir(sf1_dir):
        print(
            f"missing {sf1_dir} — run tools/make_second_decade_fixture.py",
            file=sys.stderr,
        )
        sys.exit(2)
    spark = build_session(app_name="scaling-second-decade")
    qs = registry.all_queries()
    results = {}
    worst = 0.0
    for key in args.keys:
        fn = qs[key]
        times = {
            tag: time_query(fn, spark, d, args.repeats) for tag, d in SF_DIRS
        }
        r1 = times["sf0.1"] / times["sf0.01"]
        r2 = times["sf1"] / times["sf0.1"]
        worst = max(worst, r2)
        results[key] = {
            "sec": {t: round(v, 3) for t, v in times.items()},
            "ratio_decade1": round(r1, 2),
            "ratio_decade2": round(r2, 2),
        }
        flag = " <-- SUPERLINEAR" if r2 > SUPERLINEAR_RATIO else ""
        print(
            f"  {key}: {times['sf0.01']:.2f}s -> {times['sf0.1']:.2f}s -> "
            f"{times['sf1']:.2f}s  (x{r1:.1f}, x{r2:.1f}){flag}"
        )
    print(json.dumps({"watch_keys": results, "gate": SUPERLINEAR_RATIO}))
    if worst > SUPERLINEAR_RATIO:
        sys.exit(1)


if __name__ == "__main__":
    main()
