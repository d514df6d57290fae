"""Scaling-exponent note for the expensive-tail replica (VERDICT r4 item 2).

Joins per-row Spark wall times from two validate_oracles logs (sf0.01 and
sf0.1, same local[8] protocol) and prints, per query, the empirical cost
exponent  alpha = log10(t_hi / t_lo)  for the 10x data step — alpha = 1 is
linear-in-data, alpha < 1 sublinear (fixed per-round cost dominates),
alpha > 1 superlinear (flagged).  Rows under a floor time at sf0.01 are
noise-dominated and skipped from flagging.

Usage: python tools/tail_exponents.py BENCH/gate_replica_r5s2_sf0.01.txt \
           BENCH/gate_replica_r5_sf0.1_tail.txt
"""

from __future__ import annotations

import math
import re
import sys

PAT = re.compile(r"^ok\s+(\S+?):.*\[(\d+(?:\.\d+)?)s\]")


def parse(path: str) -> dict[str, float]:
    out: dict[str, float] = {}
    with open(path) as f:
        for line in f:
            m = PAT.match(line)
            if m:
                out[m.group(1)] = float(m.group(2))
    return out


def main() -> None:
    lo = parse(sys.argv[1])
    hi = parse(sys.argv[2])
    rows = []
    for name, t_hi in hi.items():
        if name not in lo:
            continue
        t_lo = lo[name]
        alpha = math.log10(t_hi / t_lo) if t_lo > 0 else float("nan")
        rows.append((alpha, name, t_lo, t_hi))
    rows.sort(reverse=True)
    print(f"{'query':32s} {'sf0.01':>8s} {'sf0.1':>8s} {'alpha':>6s}  verdict")
    flagged = 0
    for alpha, name, t_lo, t_hi in rows:
        if t_lo < 5.0:
            verdict = "(noise floor)"
        elif alpha > 1.0:
            verdict = "FLAG superlinear"
            flagged += 1
        elif alpha > 0.8:
            verdict = "~linear"
        else:
            verdict = "sublinear"
        print(f"{name:32s} {t_lo:8.1f} {t_hi:8.1f} {alpha:6.2f}  {verdict}")
    print(f"flagged superlinear (t_lo>=5s): {flagged}")


if __name__ == "__main__":
    main()
