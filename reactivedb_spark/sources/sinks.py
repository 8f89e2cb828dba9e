"""Sinks: batch and streaming writers.

The reference's only egress is its response socket (SURVEY.md §2.5);
Spark-side the natural sinks are partitioned columnar tables and
streaming sinks. Partitioning guidance for 100 TB: partition by a
low-cardinality time/tenant column (partition pruning), bucket by the
dominant join key (shuffle-free joins downstream), target 128 MB-1 GB
files (``maxRecordsPerFile`` / AQE coalescing keeps small files down).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Optional[Sequence[str]] = None,
    max_records_per_file: Optional[int] = None,
    **options,
) -> None:
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.options(**options).save(path)


def stream_to_parquet(df: DataFrame, path: str, checkpoint_dir: str,
                      trigger_once: bool = False):
    """Append a streaming DataFrame to a parquet directory sink."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
