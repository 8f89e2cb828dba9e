"""Shared fixture-loading helpers for the query suite."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table == "events":
        # events.ts is parquet TIMESTAMP(NANOS): Spark 4 only reads it with
        # the nanosAsLong flag → int64 nanoseconds, which is what we want
        # for engine-portable time arithmetic anyway.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
