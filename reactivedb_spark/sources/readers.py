"""Batch and streaming source readers.

All readers return DataFrames with explicit schemas where possible —
schema inference at 100 TB is a full extra scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T


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
    """Driver-fixture reader (TESTDATA.md tables).

    `events.ts` is normalized to int64 epoch-nanoseconds whatever the
    physical parquet type: TIMESTAMP(NANOS) files read as long via the
    legacy flag; TIMESTAMP(MICROS) NTZ files go through a
    session-timezone-independent field diff (timestampdiff on NTZ
    operands — a TZ-dependent NTZ→LTZ cast would shift the epoch under
    a non-UTC driver session); instant-typed TIMESTAMP uses
    unix_micros, which is already TZ-independent. Integer ns is the
    engine's canonical event-time representation — exact cross-engine
    arithmetic, no timezone semantics in the suite's oracles.
    """
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events":
        dt = dict(df.dtypes).get("ts", "")
        if dt == "timestamp_ntz":
            df = df.withColumn(
                "ts",
                (F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)")
                 * F.lit(1000)).cast("long"),
            )
        elif dt == "timestamp":
            df = df.withColumn("ts", (F.unix_micros("ts") * F.lit(1000)).cast("long"))
    return df


def stream_parquet_dir(spark: SparkSession, path: str, schema: T.StructType,
                       max_files_per_trigger: int | None = 1) -> DataFrame:
    """File-source stream: picks up new parquet files dropped into ``path``.
    ``maxFilesPerTrigger`` bounds micro-batch size (backpressure)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)
