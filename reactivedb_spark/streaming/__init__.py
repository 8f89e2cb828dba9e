from reactivedb_spark.streaming.listen import stream_into, windowed_counts  # noqa: F401
