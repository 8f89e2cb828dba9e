#!/usr/bin/env python
"""Engine point-lookup pruning measurement at sf1 (VERDICT r5 #7).

Builds the same 6M-row engine source table twice from /tmp/sf1 lineitem:
once with arrival-order ingest (unsorted files) and once with
``insert_df(order_by=["k"])`` (range-partitioned sort → per-file and
per-row-group disjoint key ranges). Measures, for ``find_one`` and a
10th-percentile ``less_than``:

- wall clock (median of N probes), and
- how many parquet ROW GROUPS overlap the probe key range (pyarrow
  footer min/max — the static quantity Spark's parquet reader uses for
  row-group skipping, i.e. the layout's stand-in for the reference's
  per-column B+tree, storage_manager_table.rs:250-261).

Usage: python scripts/measure_pointlookup_sf1.py [--sf-dir /tmp/sf1]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def row_group_overlap(table_dir: str, column: str, lo, hi) -> tuple[int, int]:
    """(overlapping, total) row groups for key range [lo, hi] across the
    current version's parquet files."""
    import pyarrow.parquet as pq

    total = hit = 0
    for path in glob.glob(os.path.join(table_dir, "**", "*.parquet"),
                          recursive=True):
        md = pq.ParquetFile(path).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = names[column]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            total += 1
            if st is None or st.min is None:
                hit += 1  # no stats = unprunable
            elif not (st.max < lo or st.min > hi):
                hit += 1
    return hit, total


def current_table_dir(eng, name: str) -> str:
    return eng.store._dir(name, eng.store.current_version(name))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf1")
    ap.add_argument("--probes", type=int, default=9)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from reactivedb_spark.engine import Engine
    from reactivedb_spark.session import get_spark

    spark = get_spark("pointlookup", cpus=os.cpu_count() or 8)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).count()

    cfg = {"tables": [{"Source": {"name": "rows", "columns": {
        "k": "Integer", "v": "Integer"}}}]}
    # l_partkey is uncorrelated with lineitem's physical order — the
    # honest "arrival order" key; quantities as payload
    src = spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet")) \
        .select(F.col("l_partkey").cast("long").alias("k"),
                F.col("l_orderkey").cast("long").alias("v"))
    n = src.count()
    kmax = src.agg(F.max("k")).collect()[0][0]
    p10 = kmax // 10
    probes = [kmax // args.probes * i + 1 for i in range(1, args.probes + 1)]

    out = {"rows": n, "sf_dir": args.sf_dir}
    for label, order in (("arrival", None), ("sorted", ["k"])):
        eng = Engine(spark, cfg,
                     workspace=tempfile.mkdtemp(prefix=f"rdb_pl_{label}_"))
        eng.insert_df("rows", src, order_by=order)
        tdir = current_table_dir(eng, "rows")

        walls = []
        for p in probes:
            t0 = time.perf_counter()
            eng.find_one("rows", "k", p)
            walls.append(time.perf_counter() - t0)
        lt0 = time.perf_counter()
        n_lt = eng.less_than("rows", "k", p10).count()
        lt_wall = time.perf_counter() - lt0

        hit_pt, total = row_group_overlap(tdir, "k", probes[0], probes[0])
        hit_rng, _ = row_group_overlap(tdir, "k", 0, p10)
        out[label] = {
            "find_one_ms_median": round(statistics.median(walls) * 1000, 1),
            "less_than_p10_s": round(lt_wall, 2),
            "less_than_rows": n_lt,
            "rg_overlap_point": f"{hit_pt}/{total}",
            "rg_overlap_p10_range": f"{hit_rng}/{total}",
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
