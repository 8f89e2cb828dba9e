#!/usr/bin/env python
"""Compute the next round's correctness-window rotation from the driver
evidence on disk (VERDICT r8 #5 — make the rotation rule a program, not
tribal knowledge).

Rule, in priority order, 50 slots:
  1. never-gated queries (no green row in ANY CORRECTNESS_r*.json),
     alphabetical — new queries always green-gate on first exposure;
  2. stalest-first by newest green round (ties alphabetical) until the
     window is full.

Prints the proposed ``_WINDOW`` tuple body plus a staleness census, so
the round-N builder can paste it into ``reactivedb_spark/suite/
__init__.py`` and update ``tests/test_suite_registration.py``.

Usage: python scripts/plan_window.py [--size 50]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_green() -> dict[str, int]:
    newest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            ok = bool(row.get("rows_match")) and row.get("schema_match") is not False
            if ok:
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=50)
    args = ap.parse_args()

    sys.path.insert(0, HERE)
    import __spark_entry__ as entry

    registered = list(entry.queries())
    greens = newest_green()

    never = sorted(n for n in registered if n not in greens)
    stale = sorted((n for n in registered if n in greens),
                   key=lambda n: (greens[n], n))

    window = (never + stale)[: args.size]

    from collections import Counter

    census = Counter(greens.get(n, 0) for n in registered)
    print("# staleness census (newest green round -> queries; 0 = never):")
    for rnd in sorted(census):
        print(f"#   r{rnd}: {census[rnd]}")
    print(f"# proposed window ({len(window)} slots): "
          f"{len(never)} never-gated first, then stalest-first")
    print("_WINDOW = (")
    for n in window:
        tag = "never gated" if n not in greens else f"newest green r{greens[n]}"
        print(f'    "{n}",  # {tag}')
    print(")")


if __name__ == "__main__":
    main()
