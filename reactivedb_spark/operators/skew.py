"""Skew-aware aggregation: two-stage salted groupBy.

At 100 TB a handful of hot keys (the `lineitem` of one mega-order, one
bot user's events) can pin a single reducer. AQE's skew-join handling
covers joins; for *aggregations* the classic fix is salting: stage 1
aggregates on (key, salt) spreading a hot key over N reducers, stage 2
combines the N partials. Only decomposable aggregates (sum/count/min/
max) can ride this — which is exactly what the engine's decomposable
memo plans emit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def salted_sum_count(
    df: DataFrame,
    key_cols: Sequence[str],
    sum_cols: Sequence[str],
    salt_buckets: int = 16,
) -> DataFrame:
    """groupBy(key).agg(sum(c)..., count(*)) resistant to key skew.

    Stage 1 shuffles on (key, salt) — a hot key occupies ``salt_buckets``
    reducers; stage 2 shuffles only one row per (key, salt). Results are
    identical to the direct groupBy (sums are decimal/long-exact when the
    caller feeds exact types — same determinism contract as the rest of
    the engine).
    """
    keys = list(key_cols)
    salted = df.withColumn(
        "_salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    stage1 = salted.groupBy(*keys, "_salt").agg(
        F.count("*").alias("_n"),
        *[F.sum(c).alias(f"_s_{c}") for c in sum_cols],
    )
    return stage1.groupBy(*keys).agg(
        F.sum("_n").cast("long").alias("n"),
        *[F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sum_cols],
    )
