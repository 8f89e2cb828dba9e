"""Shared fixture-loading helpers for the query suite."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from reactivedb_spark.sources.readers import read_fixture


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    # read_fixture normalizes events.ts to int64 epoch-ns regardless of
    # the physical parquet timestamp type.
    return read_fixture(spark, sf_dir, table)
