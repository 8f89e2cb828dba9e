"""OLAP headline queries — the classic analytical shapes Spark gives for
free that the reference cannot express at all (no joins beyond the Union
merge, no group-by-multiple-columns, no date predicates — SURVEY.md §2.4).

Determinism: per-row double arithmetic (same op order both engines) is
cast to decimal before the SUM, so the aggregate is exact and
partition-order-proof; averages are a final double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from reactivedb_spark import stats
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
            # exact decimal sums internally; a single final cast to double is
            # deterministic cross-engine (verified bit-identical vs DuckDB) and
            # sidesteps the driver's decimal canonicalization divergence.
            F.sum(qty).cast("decimal(38,2)").cast("double").alias("sum_qty"),
            F.sum(price).cast("decimal(38,2)").cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(38,6)").cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(38,6)").cast("double").alias("sum_charge"),
            F.count("*").cast("long").alias("count_order"),
        )
        .withColumn(
            "avg_qty", F.col("sum_qty") / F.col("count_order")
        )
    )
    return out


SQL_TPCH_Q1_LIKE = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_base_price,
       CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
       CAST(COUNT(*) AS BIGINT) AS count_order,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
         / CAST(COUNT(*) AS BIGINT) AS avg_qty
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1995-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    """3-way join rollup: lineitem ⋈ orders ⋈ customer ⋈ nation. nation
    is a CONSTANT dimension (25 rows at every scale factor) → always
    broadcast; customer GROWS with the corpus (15 B rows at 100 TB) →
    size-gated hint (stats.broadcast_if_small), above the gate it
    shuffle-joins and AQE decides from runtime stats."""
    li = load(spark, sf, "lineitem").select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)").alias("rev"),
    )
    orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(stats.broadcast_if_small(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum("rev").cast("decimal(38,4)").cast("double").alias("revenue"),
            F.count("*").cast("long").alias("n_lineitems"),
        )
    )


SQL_REVENUE_BY_NATION = """
SELECT n_name,
       CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """For each click event, the user's most recent purchase value at or
    before the click (point-in-time feature join). Oracle: DuckDB's
    native ASOF JOIN. Times compared at µs precision on both engines."""
    from reactivedb_spark.operators.asof import asof_join

    ev = load(spark, sf, "events")  # ts = int64 ns
    base = ev.select(
        "event_id", "user_id", "event_type", "value",
        F.expr("CAST(ts div 1000 AS BIGINT)").alias("tus"),
    )
    clicks = base.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "tus", "value"
    )
    purchases = base.filter(F.col("event_type") == "purchase").select(
        "user_id", "tus", F.col("value").alias("purchase_value"),
        F.col("event_id").alias("p_event_id"),
    )
    out = asof_join(
        clicks, purchases, on=["user_id"], time_col="tus",
        value_cols=["purchase_value"], tie_break="p_event_id", suffix="",
    )
    return out.select("event_id", "user_id", "tus", "value", "purchase_value")


SQL_ASOF_JOIN = """
WITH base AS (
  SELECT event_id, user_id, event_type, "value", epoch_us(ts) AS tus FROM events),
clicks AS (
  SELECT event_id, user_id, tus, "value" FROM base WHERE event_type = 'click'),
purchases AS (
  SELECT user_id, tus, "value" AS purchase_value, event_id FROM base
  WHERE event_type = 'purchase'
  QUALIFY row_number() OVER (PARTITION BY user_id, tus ORDER BY event_id DESC) = 1)
SELECT c.event_id, c.user_id, c.tus, c."value", p.purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.tus >= p.tus
"""


def q_rollup_orders(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP grouping-set aggregation — absent in the reference
    (SURVEY.md §2.4), native in Spark."""
    o = load(spark, sf, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("decimal(38,2)").cast("double").alias("total"),
        )
    )


SQL_ROLLUP_ORDERS = """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_cube_orders(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE grouping sets (all 4 combinations of the two dimensions)."""
    o = load(spark, sf, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("decimal(38,2)").cast("double").alias("total"),
    )


SQL_CUBE_ORDERS = """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Set operator coverage: customers in BUILDING segment minus those
    holding an order above 300k (EXCEPT = left_anti distinct)."""
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    big = orders.filter(F.col("o_totalprice") > 300000.0).select(
        F.col("o_custkey").alias("custkey")
    )
    return building.exceptAll(big.distinct()).distinct()


SQL_SET_OPS = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
"""


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def q_pivot_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot: order counts per status × priority as columns (expressed as
    conditional aggregation so the SQL twin is dialect-portable)."""
    o = load(spark, sf, "orders")
    aggs = [
        F.sum(F.when(F.col("o_orderpriority") == p, 1).otherwise(0))
        .cast("long")
        .alias(f"p{i + 1}")
        for i, p in enumerate(_PRIORITIES)
    ]
    return o.groupBy("o_orderstatus").agg(*aggs)


SQL_PIVOT_PRIORITY = (
    "SELECT o_orderstatus, "
    + ", ".join(
        f"CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END) AS BIGINT) AS p{i + 1}"
        for i, p in enumerate(_PRIORITIES)
    )
    + " FROM orders GROUP BY o_orderstatus"
)


def q_distinct_agg(spark: SparkSession, sf: str) -> DataFrame:
    """COUNT(DISTINCT) — the distinct-aggregate operator class (absent in
    the reference, SURVEY.md §2.4)."""
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").cast("long").alias("n_parts"),
        F.count("*").cast("long").alias("n_lines"),
    )


SQL_DISTINCT_AGG = """
SELECT l_suppkey, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem GROUP BY l_suppkey
"""


def q_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    """left_semi = EXISTS: customers holding at least one urgent order."""
    cust = load(spark, sf, "customer")
    urgent = load(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


SQL_SEMI_JOIN = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


def q_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    """left_anti = NOT EXISTS: parts never shipped."""
    part = load(spark, sf, "part")
    li = load(spark, sf, "lineitem")
    return part.join(
        li, part.p_partkey == li.l_partkey, "left_anti"
    ).select("p_partkey", "p_name")


SQL_ANTI_JOIN = """
SELECT p_partkey, p_name FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
"""


def q_median_price(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated median per order status (both engines use the
    same (1-g)·lower + g·upper interpolation; round(9) absorbs FP)."""
    o = load(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 9).alias("median_price"),
        F.count("*").cast("long").alias("n"),
    )


SQL_MEDIAN_PRICE = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 9) AS median_price,
       CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderstatus
"""


QUERIES = {
    "median_price": q_median_price,
    "semi_join": q_semi_join,
    "anti_join": q_anti_join,
    "distinct_agg": q_distinct_agg,
    "tpch_q1_like": q_tpch_q1_like,
    "revenue_by_nation": q_revenue_by_nation,
    "asof_join": q_asof_join,
    "rollup_orders": q_rollup_orders,
    "cube_orders": q_cube_orders,
    "set_ops": q_set_ops,
    "pivot_priority": q_pivot_priority,
}

ORACLES = {
    "median_price": SQL_MEDIAN_PRICE,
    "semi_join": SQL_SEMI_JOIN,
    "anti_join": SQL_ANTI_JOIN,
    "distinct_agg": SQL_DISTINCT_AGG,
    "tpch_q1_like": SQL_TPCH_Q1_LIKE,
    "revenue_by_nation": SQL_REVENUE_BY_NATION,
    "asof_join": SQL_ASOF_JOIN,
    "rollup_orders": SQL_ROLLUP_ORDERS,
    "cube_orders": SQL_CUBE_ORDERS,
    "set_ops": SQL_SET_OPS,
    "pivot_priority": SQL_PIVOT_PRIORITY,
}


def q_regression_by_group(spark: SparkSession, sf: str) -> DataFrame:
    """Per-supplier OLS fit of extended price on quantity
    (operators/regression.py): the whole fit is ONE partial-aggregable
    hash aggregation of five exact-decimal sufficient statistics, then
    narrow per-group scalar math — a SUM's cost at any scale. Spark's
    builtin regr_slope aggregates in doubles (partition-order-
    dependent); this is the order-proof formulation."""
    from reactivedb_spark.operators import regression

    return regression.ols_by_group(
        load(spark, sf, "lineitem"), ["l_suppkey"], "l_quantity", "l_extendedprice"
    )


def _sql_regression_by_group() -> str:
    from reactivedb_spark.operators import regression

    return regression.oracle_sql(
        "lineitem", ["l_suppkey"], "l_quantity", "l_extendedprice"
    )


SQL_REGRESSION_BY_GROUP = _sql_regression_by_group()

QUERIES["regression_by_group"] = q_regression_by_group
ORACLES["regression_by_group"] = SQL_REGRESSION_BY_GROUP


def q_corr_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Pairwise Pearson correlations of lineitem's four measures in ONE
    hash aggregation (operators/regression.corr_matrix): exact-decimal
    sufficient statistics, a single inline() unpivot, and sqrt — the
    one libm call IEEE requires to be correctly rounded, hence
    bit-portable."""
    from reactivedb_spark.operators import regression

    return regression.corr_matrix(
        load(spark, sf, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


def _sql_corr_matrix() -> str:
    from reactivedb_spark.operators import regression

    return regression.corr_oracle_sql(
        "lineitem", ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


QUERIES["corr_matrix"] = q_corr_matrix
ORACLES["corr_matrix"] = _sql_corr_matrix()
