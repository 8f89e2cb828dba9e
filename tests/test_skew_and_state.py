"""Salted aggregation equivalence + stateful streaming operator."""

import time

from pyspark.sql import functions as F, types as T

from reactivedb_spark.operators.skew import salted_sum_count
from reactivedb_spark.sources import stream_parquet_dir
from reactivedb_spark.streaming.listen import stateful_running_totals


def test_salted_aggregate_equals_direct(spark):
    # skewed: 90% of rows share one key
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id") % 7)
        ).alias("k"),
        (F.col("id") % 100).cast("decimal(18,2)").alias("v"),
    )
    direct = {
        r["k"]: (r["n"], r["sum_v"])
        for r in df.groupBy("k")
        .agg(F.count("*").cast("long").alias("n"), F.sum("v").alias("sum_v"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["sum_v"]) for r in salted_sum_count(df, ["k"], ["v"]).collect()
    }
    assert salted == direct


def test_stateful_running_totals(spark, tmp_path):
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.DoubleType())]
    )
    src = tmp_path / "in"
    src.mkdir()
    spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 5.0)], schema).coalesce(
        1
    ).write.mode("append").parquet(str(src))
    spark.createDataFrame([("a", 3.0)], schema).coalesce(1).write.mode("append").parquet(
        str(src)
    )

    stream = stream_parquet_dir(spark, str(src), schema)
    out = stateful_running_totals(stream, "k", "v")
    name = f"state_{int(time.time())}"
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    # state carried across micro-batches: final 'a' totals include batch 1+2
    finals = {}
    for r in rows:
        finals[r["k"]] = max(finals.get(r["k"], (0, 0.0)), (r["n"], r["total"]))
    assert finals["a"] == (3, 6.0)
    assert finals["b"] == (1, 5.0)
