#!/usr/bin/env python
"""Per-decade ratio table for a pair of bench --scale raw files
(VERDICT r12 #7): reads the committed sf0.1 medians (BENCH_FULL.json)
plus the sf1 and sf10 ``BENCH_RAW_*-scale.json`` drives and prints, per
query, wall(sf0.1) / wall(sf1) / wall(sf10) and the two per-decade
ratios — sorted by the second decade (the one the sf10 drive newly
measures). In-suite walls are UPPER BOUNDS (the suite itself is the
32-core load); anything >5x/decade gets re-measured solo via
``bench.py --only <q> --raw`` before being called a scale risk.

Usage: python scripts/analyze_scale_drive.py SF1_RAW SF10_RAW
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf1_path, sf10_path = sys.argv[1], sys.argv[2]
    with open(os.path.join(HERE, "BENCH_FULL.json")) as f:
        committed = json.load(f)["queries"]
    with open(sf1_path) as f:
        sf1 = json.load(f)
    with open(sf10_path) as f:
        sf10 = json.load(f)
    q1, q10 = sf1["queries"], sf10["queries"]
    rows = []
    for name, w10 in q10.items():
        w1 = q1.get(name)
        w01 = committed.get(name)
        d1 = (w1 / w01) if (w1 and w01) else None
        d2 = (w10 / w1) if (w1 and w10) else None
        rows.append((name, w01, w1, w10, d1, d2))
    rows.sort(key=lambda r: -(r[5] or 0))
    print(f"{'query':34s} {'sf0.1':>8s} {'sf1':>8s} {'sf10':>9s} "
          f"{'x/dec1':>7s} {'x/dec2':>7s}")
    for name, w01, w1, w10, d1, d2 in rows:
        print(f"{name:34s} {w01 or 0:8.2f} {w1 or 0:8.2f} {w10 or 0:9.2f} "
              f"{d1 or 0:7.2f} {d2 or 0:7.2f}")
    d2s = sorted(r[5] for r in rows if r[5])
    n = len(d2s)
    print(f"\nn={n}  2nd-decade ratio: median={d2s[n // 2]:.2f}  "
          f"p90={d2s[int(n * 0.9)]:.2f}  max={d2s[-1]:.2f}")
    over = [r for r in rows if (r[5] or 0) > 5]
    print(f">5x 2nd decade: {len(over)}: "
          f"{[(r[0], round(r[5], 1)) for r in over]}")
    for label, d in (("sf1", sf1), ("sf10", sf10)):
        print(f"{label}: wall={d['value']} n={len(d['queries'])} "
              f"canary={d.get('canary')} load1={d.get('load1_summary')}")


if __name__ == "__main__":
    main()
