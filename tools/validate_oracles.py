"""Mimic the driver's correctness gate: run every queries() entry on Spark
and its oracle_sql() in DuckDB at a given sf dir; compare row counts,
schemas, and values (order-insensitive, columns sorted by name).

Usage: python tools/validate_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from plato_spark.session import get_spark  # noqa: E402
from plato_spark.sources.tables import TABLES  # noqa: E402


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
                if v == 0.0:
                    v = 0.0  # fold IEEE -0.0: equal under ==, but
                    # "-0.0" != "0.0" under the stringified row-sort
                    # below, which would misalign whole sorted blocks
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # snapshot-freshness header: tie every replica log to the exact code
    # state it ran against (VERDICT r3 item 7)
    import subprocess
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
        dirty = subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        sha, dirty = "unknown", ""
    n_reg = len(entrymod.queries())
    print(f"# validate_oracles @ git {sha}{'+dirty' if dirty else ''} | "
          f"registry {n_reg} queries | sf_dir {sf_dir} | "
          f"selected {len(only) or 'ALL'} | "
          f"{time.strftime('%Y-%m-%dT%H:%M:%S')}")
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        spark_sec = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(s_rows)} (no oracle, rows-only) "
                  f"[{spark_sec:.1f}s]")
            if len(s_rows) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: schema mismatch spark={sorted(s_cols)} "
                  f"duck={sorted(d_cols)}")
            failures += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            failures += 1
            continue
        _, ns = normalize(s_rows, s_cols)
        _, nd = normalize(d_rows, d_cols)
        bad = sum(1 for a, b in zip(ns, nd) if a != b)
        if bad:
            # show first few diffs + max float delta
            maxd = 0.0
            shown = 0
            for a, b in zip(ns, nd):
                if a != b:
                    for x, y in zip(a, b):
                        if isinstance(x, float) and isinstance(y, float):
                            maxd = max(maxd, abs(x - y))
                    if shown < 3:
                        print(f"   diff: spark={a} duck={b}")
                        shown += 1
            print(f"FAIL {name}: {bad}/{len(ns)} rows differ (max float delta "
                  f"{maxd:.2e}) [{spark_sec:.1f}s]")
            failures += 1
        else:
            print(f"ok   {name}: {len(ns)} rows match [{spark_sec:.1f}s]")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
