from reactivedb_spark.networking.server import ReactiveDBServer  # noqa: F401
