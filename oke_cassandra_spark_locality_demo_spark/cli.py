"""Command-line entry point: `python -m oke_cassandra_spark_locality_demo_spark <cmd>`.

The reference's user runs one spark-submit job that reads a table and
prints it (/root/reference/userdata/cloudinit.sh:444-479). The engine
equivalent:

    python -m oke_cassandra_spark_locality_demo_spark list                 # every registered query
    python -m oke_cassandra_spark_locality_demo_spark run q_join_asof      # run one, print result
    python -m oke_cassandra_spark_locality_demo_spark run q_agg_hash --sf /root/testdata/sf0.01
    python -m oke_cassandra_spark_locality_demo_spark explain q_join_broadcast   # formatted plan
    python -m oke_cassandra_spark_locality_demo_spark info                 # engine liveness row
"""

from __future__ import annotations

import argparse
import sys

from . import registry
from .catalog import DEFAULT_SF_DIR
from .session import build_session


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="oke_cassandra_spark_locality_demo_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    sub.add_parser("info", help="engine liveness/metadata row")
    for cmd in ("run", "explain"):
        sp = sub.add_parser(cmd)
        sp.add_argument("query")
        sp.add_argument("--sf", default=DEFAULT_SF_DIR, help="fixture dir")
        sp.add_argument("--rows", type=int, default=20)
    args = p.parse_args(argv)

    if args.cmd == "list":
        oracles = registry.all_oracles()
        for name in sorted(registry.all_queries()):
            kind = "oracle" if name in oracles else "rows-only"
            doc = registry.get(name).doc.split("\n")[0]
            print(f"{name:32s} [{kind}] {doc}")
        return 0

    spark = build_session(app_name="spark-graft-cli")
    if args.cmd == "info":
        from .operators.meta import engine_info

        engine_info(spark).show(truncate=False)
        return 0

    spec = registry.get(args.query)
    df = spec.fn(spark, args.sf)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        # the A8 analog: collect-limit + console render
        df.show(args.rows, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
