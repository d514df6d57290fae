"""Registry-wide physical-plan sweep (VERDICT r4 item 5).

Builds every registered query's DataFrame at a small sf dir and scans
`explain('formatted')` output for plan anti-patterns:

the rules in plato_spark/engine/plan_audit.py: CartesianProduct,
conditioned BroadcastNestedLoopJoin (condition-less 1-row-total cross
broadcasts are the documented fine idiom), and row-at-a-time
BatchEvalPython (Arrow nodes are fine).

Usage: python tools/plan_sweep.py [sf_dir] [query ...]
Prints one line per query: `ok name` or `HIT name: <patterns>`.
The pytest twin (tests/test_plan_sweep.py) asserts the same rules
against tests/plan_allowlist.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from plato_spark.engine.plan_audit import formatted_plan, plan_violations  # noqa: E402
from plato_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    hits = 0
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            p = formatted_plan(df)
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: {exc}", flush=True)
            hits += 1
            continue
        found = plan_violations(p)
        if found:
            print(f"HIT  {name}: {'; '.join(found)} [{time.time() - t0:.1f}s]",
                  flush=True)
            hits += 1
        else:
            print(f"ok   {name} [{time.time() - t0:.1f}s]", flush=True)
    print("HITS:", hits)


if __name__ == "__main__":
    main()
