"""Skewed-group general fold at scale (VERDICT r12 #4 'Done' criterion).

Builds a deliberately skewed parent relation from lineitem at the given
sf dir — ONE key holding ~90% of all rows, the rest spread over ~64
keys — and runs a non-decomposable aggregation (``a ~ abs(memo.a) + qty``,
rejected by ``classify`` because the memo sits inside a function call)
through compute_groups:

  auto    — the production router: the 90% key exceeds
            GENERAL_FOLD_MAX_GROUP_ROWS and folds on the Arrow streaming
            path; every other key folds on the JVM array path
  stream  — everything forced through the streaming fold
  array   — everything forced through the array fold (the pre-r13 plan:
            the hot key materializes as ONE collect_list array cell)

Usage: python scripts/profile_fold_skew.py /tmp/sf1 [variants...]
Prints one JSON line per variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf = sys.argv[1]
    variants = sys.argv[2:] or ["auto", "stream", "array"]
    from reactivedb_spark.config import AggregationTransformConfig
    from reactivedb_spark.expr.parser import parse_statement
    from reactivedb_spark.operators import aggregation
    from reactivedb_spark.session import get_spark

    spark = get_spark()
    spark.range(10**6).groupBy((F.col("id") % 7).alias("k")).count().collect()

    li = spark.read.parquet(os.path.join(sf, "lineitem.parquet"))
    parent = li.select(
        F.concat(F.lit("e"), F.col("l_orderkey").cast("string"),
                 F.lit("-"), F.col("l_linenumber").cast("string")).alias("_entryId"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("long").alias("_seq"),
        F.when(F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(10)) < 9,
               F.lit(0)).otherwise(
            F.pmod(F.xxhash64("l_linenumber", "l_orderkey"), F.lit(64)) + 1
        ).cast("long").alias("k"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    n = parent.count()
    hot = parent.filter(F.col("k") == 0).count()
    cfg = AggregationTransformConfig(
        "src", "k", (parse_statement("a ~ abs(memo.a) + qty"),))
    assert aggregation.classify(cfg) is None, "config must be non-decomposable"
    for variant in variants:
        t0 = time.monotonic()
        out = aggregation.compute_groups(cfg, parent, fold_strategy=variant)
        rows = out.count()
        wall = round(time.monotonic() - t0, 2)
        print(json.dumps({
            "sf_dir": sf, "variant": variant, "wall_sec": wall,
            "rows_in": n, "hot_key_rows": hot, "groups_out": rows,
            "load1": round(os.getloadavg()[0], 2)}), flush=True)


if __name__ == "__main__":
    main()
