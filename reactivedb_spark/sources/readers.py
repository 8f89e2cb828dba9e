"""Batch and streaming source readers.

All readers return DataFrames with explicit schemas where possible —
schema inference at 100 TB is a full extra scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema: T.StructType | None = None, **options) -> DataFrame:
    """Batch read. parquet/orc get predicate pushdown + column pruning for
    free; csv/json should always pass an explicit schema."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.format(fmt).options(**options).load(path)


def read_fixture(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Driver-fixture reader (TESTDATA.md tables)."""
    if table == "events":
        # events.ts is parquet TIMESTAMP(NANOS); Spark 4 reads it only as
        # int64 nanoseconds via the legacy flag — which is also the
        # deterministic representation the suite wants.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def stream_parquet_dir(spark: SparkSession, path: str, schema: T.StructType,
                       max_files_per_trigger: int | None = 1) -> DataFrame:
    """File-source stream: picks up new parquet files dropped into ``path``.
    ``maxFilesPerTrigger`` bounds micro-batch size (backpressure)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)
