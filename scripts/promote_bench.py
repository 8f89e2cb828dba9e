#!/usr/bin/env python
"""Promote load-gated per-query medians from dated raw bench records
into BENCH_FULL.json (VERDICT r7 #3: bench.py writes only
``BENCH_RAW_<utc>.json``; the committed record changes ONLY through
this explicit step, so a driver run under a load window can never
overwrite the calm medians in place).

Usage::

    python scripts/promote_bench.py [--gate LOAD1] [RAW.json ...]

With no files given, every ``BENCH_RAW_*.json`` in the repo root is
considered. Per query: samples whose recorded ``load1`` is <= the gate
(default 4.0 — comfortably idle on a 32-cpu host; rows without a load
reading are treated as gated-out) are pooled across the raw files and
the median is promoted. Queries with NO calm sample keep their current
BENCH_FULL.json value (promotion never degrades the record to a known
load artifact). The output carries provenance: which raw files fed it,
the gate, and per-query sample counts.
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    gate = 4.0
    files: list[str] = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--gate" and i + 1 < len(args):
            gate = float(args[i + 1])
            i += 2
        else:
            files.append(args[i])
            i += 1
    if not files:
        files = sorted(glob.glob(os.path.join(HERE, "BENCH_RAW_*.json")))
    if not files:
        raise SystemExit("no BENCH_RAW_*.json records to promote")

    samples: dict[str, list[float]] = {}
    sf = None
    micro = None
    for path in files:
        with open(path) as f:
            rec = json.load(f)
        sf = rec.get("sf", sf)
        micro = rec.get("micro", micro)
        loads = rec.get("load1", {})
        for name, sec in rec.get("queries", {}).items():
            if loads.get(name) is not None and loads[name] <= gate:
                samples.setdefault(name, []).append(sec)

    full_path = os.path.join(HERE, "BENCH_FULL.json")
    prior: dict = {}
    if os.path.exists(full_path):
        with open(full_path) as f:
            prior = json.load(f)
    prior_q = prior.get("queries", {})

    queries: dict[str, float] = {}
    counts: dict[str, int] = {}
    kept_prior: list[str] = []
    for name in sorted(set(samples) | set(prior_q)):
        if samples.get(name):
            queries[name] = round(statistics.median(samples[name]), 3)
            counts[name] = len(samples[name])
        else:
            queries[name] = prior_q[name]
            kept_prior.append(name)
    queries = dict(sorted(queries.items(), key=lambda kv: kv[1]))

    payload = {
        "metric": "suite_wall",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf if sf is not None else prior.get("sf"),
        "promotion": {
            "gate_load1": gate,
            "raw_files": [os.path.basename(p) for p in files],
            "samples_per_query": counts,
            "kept_prior_no_calm_sample": kept_prior,
        },
    }
    if micro or prior.get("micro"):
        payload["micro"] = micro or prior.get("micro")
    with open(full_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({
        "promoted": len(counts), "kept_prior": len(kept_prior),
        "suite_wall": payload["value"], "gate": gate,
        "raw_files": len(files),
    }))


if __name__ == "__main__":
    main()
