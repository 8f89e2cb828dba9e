"""OLAP headline queries — the classic analytical shapes Spark gives for
free that the reference cannot express at all (no joins beyond the Union
merge, no group-by-multiple-columns, no date predicates — SURVEY.md §2.4).

Determinism: per-row double arithmetic (same op order both engines) is
cast to decimal before the SUM, so the aggregate is exact and
partition-order-proof; averages are a final double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from reactivedb_spark.suite._common import load


def q_tpch_q1_like(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: pricing summary rollup over lineitem."""
    li = load(spark, sf, "lineitem").filter(
        F.col("l_shipdate").cast("date") <= F.lit("1995-09-02").cast("date")
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("decimal(18,6)")
    out = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("decimal(38,2)").alias("sum_qty"),
            F.sum(price).cast("decimal(38,2)").alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(38,6)").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(38,6)").alias("sum_charge"),
            F.count("*").cast("long").alias("count_order"),
        )
        .withColumn(
            "avg_qty", F.col("sum_qty").cast("double") / F.col("count_order")
        )
    )
    return out


SQL_TPCH_Q1_LIKE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sum_charge,
       CAST(COUNT(*) AS BIGINT) AS count_order,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
         / CAST(COUNT(*) AS BIGINT) AS avg_qty
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1995-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    """3-way join rollup: lineitem ⋈ orders ⋈ customer ⋈ nation. The
    dimension sides are explicitly broadcast — at any scale factor nation
    is tiny and customer ≪ lineitem, so Catalyst plans two broadcast hash
    joins and one shuffle (the final groupBy)."""
    li = load(spark, sf, "lineitem").select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)").alias("rev"),
    )
    orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum("rev").cast("decimal(38,4)").alias("revenue"),
            F.count("*").cast("long").alias("n_lineitems"),
        )
    )


SQL_REVENUE_BY_NATION = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


QUERIES = {
    "tpch_q1_like": q_tpch_q1_like,
    "revenue_by_nation": q_revenue_by_nation,
}

ORACLES = {
    "tpch_q1_like": SQL_TPCH_Q1_LIKE,
    "revenue_by_nation": SQL_REVENUE_BY_NATION,
}
