"""Sources: batch + streaming readers.

The reference's only ingress is a TCP socket of JSON rows
(client_connection.rs:50-77); Spark-side the natural ingress surface is
file/table sources for batch and Structured Streaming sources for
continuous feeds (SURVEY.md §2.5)."""

from reactivedb_spark.sources.readers import (  # noqa: F401
    read_table,
    read_fixture,
    stream_parquet_dir,
)
from reactivedb_spark.sources.sinks import (  # noqa: F401
    write_table,
    stream_to_parquet,
)
