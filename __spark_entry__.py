"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship reactive pipeline (the engine
end-to-end: bulk insert → derived-table DAG propagation → read) on
sf0.001. ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 plus the training-data extensions, each as a
(Spark DataFrame, DuckDB SQL) pair with matching column names.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

FLAGSHIP_CFG = {
    "tables": [
        {"Source": {"name": "orders", "columns": {
            "o_orderkey": "Integer", "o_custkey": "Integer",
            "o_totalprice": "Float", "o_orderstatus": "Str"}}},
        {"Derived": {"name": "open_orders",
                     "transform_definition": {"FilterTransform": {
                         "source_table": "orders",
                         "filter": 'o_orderstatus == "O"'}}}},
        {"Derived": {"name": "cust_totals",
                     "transform_definition": {"AggregationTransform": {
                         "source_table": "open_orders",
                         "aggregated_column": "o_custkey",
                         "functions": ["n ~ memo.n + 1",
                                       "total ~ memo.total + o_totalprice"]}}}},
    ]
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: reactive DAG (source → filter → aggregation) over sf0.001
    orders; returns per-customer open-order totals."""
    from pyspark.sql import functions as F

    from reactivedb_spark.engine import Engine

    eng = Engine(spark, FLAGSHIP_CFG, workspace=tempfile.mkdtemp(prefix="rdb_entry_"))
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        F.col("o_orderkey").cast("long"),
        F.col("o_custkey").cast("long"),
        F.col("o_totalprice"),
        F.col("o_orderstatus"),
    )
    eng.insert_df("orders", orders)
    return (
        eng.table("cust_totals")
        .select(
            F.col("aggregatedColumn").alias("o_custkey"),
            F.col("n"),
            F.col("total"),
        )
        .orderBy("o_custkey")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from reactivedb_spark.suite import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from reactivedb_spark.suite import all_oracles

    return all_oracles()
