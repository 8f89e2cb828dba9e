#!/usr/bin/env python
"""Candidate-count attribution for the guarded edit-distance join
(VERDICT r10 #4): replicate edit_distance_join's prefix pipeline
(operators/fuzzyjoin.py:66-109 — positional q-grams, (df,gram,occ)
rarity prefix, max_bucket stop-band) up to but NOT including the pair
join, and count post-guard candidate pairs per scale — the variable
that decides whether the family's per-decade wall factor is pair
explosion (quadratic danger) or the prefix window shuffle (linear).

Measured r11 (customer names, q=2, d=1, max_bucket=100):
sf0.1 5,871 pairs / sf1 9,627 / sf10 2,105 — the stop-band drops MORE
saturated buckets as the corpus grows; the wall factor is the prefix
stage itself (this probe reproduces 4.9×/decade).

Usage: python scripts/profile_fuzzy_candidates.py SF_DIR
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from reactivedb_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    spark = get_spark()
    spark.range(10).count()
    q, d, max_bucket = 2, 1, 100
    prefix_len = q * d + 1
    df = (spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
          .select(F.col("c_custkey").alias("_id"),
                  F.col("c_name").alias("_txt"),
                  F.length("c_name").alias("_len"))
          .filter(F.col("_txt").isNotNull()))
    long_side = df.filter(F.col("_len") > q * d + q - 1)
    exploded = long_side.select(
        "_id", "_len",
        F.posexplode(F.expr(
            f"transform(sequence(1, _len - {q - 1}),"
            f" i -> substring(_txt, i, {q}))")).alias("_pos", "gram"))
    keyed = exploded.select(
        "_id", "_len", "gram",
        F.row_number().over(
            Window.partitionBy("_id", "gram").orderBy("_pos")).alias("occ"))
    dfreq = keyed.groupBy("gram", "occ").agg(F.count(F.lit(1)).alias("_df"))
    prefix = (keyed.join(dfreq, ["gram", "occ"])
              .withColumn("_rk", F.row_number().over(
                  Window.partitionBy("_id").orderBy("_df", "gram", "occ")))
              .filter(F.col("_rk") <= prefix_len)
              .select("_id", "_len", "gram", "occ"))
    bucket_n = prefix.groupBy("gram", "occ").agg(F.count(F.lit(1)).alias("_bn"))
    kept = prefix.join(
        bucket_n.filter(F.col("_bn") <= max_bucket).select("gram", "occ"),
        ["gram", "occ"])
    t0 = time.perf_counter()
    cand = (kept.groupBy("gram", "occ").agg(F.count(F.lit(1)).alias("n"))
            .agg(F.sum(F.expr("n * (n - 1) / 2")).alias("pairs"),
                 F.count(F.lit(1)).alias("kept_buckets")).collect()[0])
    dropped = bucket_n.filter(F.col("_bn") > max_bucket).count()
    print(json.dumps({
        "sf_dir": sf_dir, "n_strings": long_side.count(),
        "candidate_pairs": int(cand["pairs"]),
        "kept_buckets": int(cand["kept_buckets"]),
        "dropped_buckets": int(dropped),
        "sec": round(time.perf_counter() - t0, 1)}))


if __name__ == "__main__":
    main()
