"""Print the registry keys never adjudicated by the driver, in
registration order — the work-list for the next round's
_ROUND_PRIORITY (see the current ROUND PLAYBOOK comment in registry.py).

Usage: python tools/rotation_remaining.py [--count]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from oke_cassandra_spark_locality_demo_spark import registry


def main() -> None:
    registry._load_all()
    names = list(registry._REGISTRY)
    sampled_next = set(registry._sample_order(names)[:50])
    remaining = [
        n
        for n in names
        if n not in registry._DRIVER_ADJUDICATED and n not in sampled_next
    ]
    if "--count" in sys.argv:
        print(len(remaining))
        return
    for n in remaining:
        oracle = "oracle" if registry._REGISTRY[n].oracle else "rows-only"
        print(f"{n}\t{oracle}")
    print(f"# {len(remaining)} keys remain after the current prefix", file=sys.stderr)


if __name__ == "__main__":
    main()
