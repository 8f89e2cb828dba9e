from reactivedb_spark.plans.dag import topo_order  # noqa: F401
