"""Shared fixture-loading helpers for the query suite."""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame, SparkSession

from reactivedb_spark.sources.readers import read_fixture


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    # read_fixture normalizes events.ts to int64 epoch-ns regardless of
    # the physical parquet timestamp type.
    return read_fixture(spark, sf_dir, table)


@contextlib.contextmanager
def streaming_shuffle(spark: SparkSession, n: int = 8):
    """Pin a small shuffle-partition count around a streaming replay.

    Stateful streaming cost scales with (shuffle partitions ×
    micro-batches) state-store instance commits per trigger; the replay
    fixtures' keyed state fits in a few partitions, so 32 state stores ×
    N batches is pure fixed overhead here. Results are partition-count-
    invariant (keyed state is hash-partitioned; the state layout is
    pinned by the FIRST batch and each suite run uses a fresh
    checkpoint). Production leaves the session default, sized to the
    cluster — this scope only narrows the replay, then restores."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
