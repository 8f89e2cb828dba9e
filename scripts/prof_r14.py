#!/usr/bin/env python
"""Round-14 solo profiling harness: min-of-N per-query walls + Spark job
counts, same methodology as bench.py (noop sink, cache_scope, clearCache
between reps, warm session). Usage::

    python scripts/prof_r14.py [--reps N] [--sf DIR] query [query ...]

Prints one JSON line: {"query": {"reps": [...], "min": s, "jobs": n}, ...}
Job counts come from setJobGroup + statusTracker.getJobIdsForGroup —
steal-immune evidence for many-small-job queries (guide §1.5/§2.1).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from reactivedb_spark.cache import cache_scope
    from reactivedb_spark.session import get_spark

    spark = get_spark("prof_r14")
    qs = entrymod.queries()
    # warm-up: one cheap query end to end (JVM/codegen/parquet reader)
    with cache_scope():
        qs["fingerprint"](spark, args.sf).write.mode("overwrite").format(
            "noop").save()
    spark.catalog.clearCache()

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    for name in args.queries:
        if name not in qs:
            print(f"unknown query {name!r}", file=sys.stderr)
            continue
        reps = []
        jobs = None
        for r in range(args.reps):
            group = f"prof-{name}-{r}"
            sc.setJobGroup(group, name)
            sc.setJobDescription(f"{name} rep{r}")
            t0 = time.perf_counter()
            with cache_scope():
                qs[name](spark, args.sf).write.mode("overwrite").format(
                    "noop").save()
            reps.append(round(time.perf_counter() - t0, 3))
            jobs = len(tracker.getJobIdsForGroup(group))
            sc.setJobGroup("", "")
            spark.catalog.clearCache()
        out[name] = {"reps": reps, "min": min(reps), "jobs": jobs,
                     "load1": round(os.getloadavg()[0], 1)}
        print(f"## {name}: min={min(reps)} jobs={jobs} reps={reps}",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
