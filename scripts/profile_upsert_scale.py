#!/usr/bin/env python
"""Keyed-upsert engine commit at the second decade (VERDICT r10 #6):
measure that the `_kb`-bucket-scoped commit (engine._replace_keyed /
store.replace_partitions) really does O(affected buckets) I/O, not
O(table), as the base table grows 10×.

Protocol per sf dir (fresh process, solo):
  1. base commit — insert_df the full customer fixture into a
     UnionTransform-keyed table (all 32 buckets written).
  2. small upsert — re-insert 10 existing keys with changed values:
     must rewrite only the ≤10 buckets those keys hash into.
  3. broad upsert — re-insert ~1% of keys spread over all 32 buckets:
     rewrites every bucket (the degenerate full-write path).
Each commit reports wall seconds, affected-bucket count, and BYTES
WRITTEN during the commit (workspace dir growth — the store retains
prior versions, so growth == bytes written).

Usage: python scripts/profile_upsert_scale.py SF_DIR  (one JSON line/leg)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _inode_sizes(root: str) -> dict[int, int]:
    """inode → size over the tree. Bytes WRITTEN by a commit = total
    size of inodes that did not exist before it: replace_partitions
    hardlinks untouched buckets into the next version dir (same inode —
    zero data I/O, must not count) and _flip deletes the n-2 version
    (must not offset), so naive dir-growth is wrong in both directions."""
    out: dict[int, int] = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            try:
                st = os.stat(os.path.join(dirpath, f))
            except OSError:
                continue
            out[st.st_ino] = st.st_size
    return out


def main() -> None:
    sf_dir = sys.argv[1]
    from pyspark.sql import functions as F

    from reactivedb_spark.engine import Engine
    from reactivedb_spark.session import get_spark

    spark = get_spark()
    spark.range(10).count()

    cfg = {"tables": [
        {"Source": {"name": "users", "columns": {
            "uid": "Integer", "age": "Integer"}}},
        {"Derived": {"name": "latest",
                     "transform_definition": {"UnionTransform": {
                         "tables_and_foreign_keys": [["users", "uid"]]}}}},
    ]}
    workspace = tempfile.mkdtemp(prefix="rdb_upscale_")
    try:
        eng = Engine(spark, cfg, workspace=workspace)
        cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")) \
            .select(F.col("c_custkey").cast("long").alias("uid"),
                    F.col("c_nationkey").cast("long").alias("age"))
        n = cust.count()

        def leg(name, batch_df):
            before = _inode_sizes(workspace)
            t0 = time.perf_counter()
            report = eng.insert_df("users", batch_df, order_by=["uid"])
            sec = round(time.perf_counter() - t0, 2)
            after = _inode_sizes(workspace)
            written = sum(sz for ino, sz in after.items() if ino not in before)
            delta = report.get("latest")
            buckets = None
            if delta is not None and delta.inserts is not None:
                buckets = delta.inserts.select("_kb").distinct().count()
            print(json.dumps({
                "leg": name, "sf_dir": sf_dir, "base_rows": n, "sec": sec,
                "mb_written": round(written / 1e6, 1),
                "delta_buckets": buckets,
                "load1": round(os.getloadavg()[0], 1)}), flush=True)

        leg("base_full", cust)
        # 10 existing keys, new values -> <=10 affected buckets
        leg("upsert_10keys",
            cust.orderBy("uid").limit(10)
            .withColumn("age", F.col("age") + F.lit(1000)))
        # ~1% of keys, uniformly spread -> all 32 buckets
        leg("upsert_1pct",
            cust.filter(F.col("uid") % 100 == 0)
            .withColumn("age", F.col("age") + F.lit(2000)))
    finally:
        shutil.rmtree(workspace, ignore_errors=True)


if __name__ == "__main__":
    main()
