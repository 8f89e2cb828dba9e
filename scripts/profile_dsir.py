#!/usr/bin/env python
"""Stage-level decomposition of dsir_resample's scale behavior
(VERDICT r10 #3: its sf1→sf10 factor is 7.1×, above the suite's
2.5–5×/decade linear band — attribute it).

Three legs, each run SOLO in a fresh process (same protocol as
bench --only, so legs are comparable to each other):

  tokens    — the exploded+hashed token stream alone (count the cached
              relation): stage 1 of the dsir plan.
  weights   — dsir_log_weights fully evaluated, consumed by a cheap
              commutative reduce (sum of log_w forces every decimal
              term; no top-k): stages 1–4.
  resample  — the full dsir_resample top-k (stages 1–5: weights +
              Gumbel key + TakeOrderedAndProject).

resample − weights isolates the selection stage; weights − tokens
isolates the bucket-count shuffles + the decimal fold.

Usage: python scripts/profile_dsir.py LEG SF_DIR  (prints one JSON line)
       python scripts/profile_dsir.py all SF_DIR  (forks one process/leg)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _run_leg(leg: str, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from reactivedb_spark.session import get_spark

    spark = get_spark()
    spark.range(10).count()  # JVM warm-up outside the measurement
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    target = F.col("lang") == "en"

    from reactivedb_spark import cache as _cache
    from reactivedb_spark.operators.importance import (dsir_log_weights,
                                                       dsir_resample)
    from reactivedb_spark.operators.sampling import _hash64

    t0 = time.perf_counter()
    with _cache.cache_scope():
        if leg == "tokens":
            toks = (docs.select(F.col("doc_id"), target.alias("_t"),
                                F.explode(F.split(F.lower(F.trim(F.col("text"))),
                                                  " ")).alias("w"))
                    .filter(F.col("w") != "")
                    .select("doc_id", "_t",
                            (_hash64(F.col("w")) % 1024).alias("bkt")))
            out = toks.agg(F.count(F.lit(1)), F.sum("bkt")).collect()
        elif leg == "weights":
            w = dsir_log_weights(docs, "doc_id", "text", target,
                                 n_buckets=1024)
            out = w.agg(F.sum("log_w"), F.sum("n_tokens"),
                        F.count(F.lit(1))).collect()
        elif leg == "resample":
            out = dsir_resample(docs, "doc_id", "text", target,
                                budget=100, n_buckets=1024).collect()
        else:
            raise SystemExit(f"unknown leg {leg!r}")
    sec = round(time.perf_counter() - t0, 2)
    print(json.dumps({"leg": leg, "sf_dir": sf_dir, "sec": sec,
                      "rows": len(out),
                      "load1": round(os.getloadavg()[0], 1)}))


def main() -> None:
    leg, sf_dir = sys.argv[1], sys.argv[2]
    if leg != "all":
        _run_leg(leg, sf_dir)
        return
    for one in ("tokens", "weights", "resample"):
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        one, sf_dir], check=True)


if __name__ == "__main__":
    main()
