"""Group-wise ordinary-least-squares regression via closed-form sums.

The analytics counterpart of a `GROUP BY` aggregate: for every group,
fit y = slope·x + intercept from the five sufficient statistics
(n, Σx, Σy, Σxy, Σx²). This is the canonical "ML-ish aggregate that is
really just a partial-aggregable fold" — the whole fit rides ONE hash
aggregation with map-side combine, so at 100 TB it costs exactly what a
`SUM` costs: a single keyed shuffle of five numbers per group, no
second pass, no driver-side math over rows.

Spark's built-in ``regr_slope``/``regr_intercept`` aggregate in IEEE
doubles, which makes the result partition-order-dependent (FP addition
is not associative). This operator instead accumulates the sufficient
statistics as EXACT decimals (per-row cast to a fixed-point grid, exact
decimal sums) and defers ALL floating-point work to per-group scalar
expressions over the finished sums — the suite's standard recipe for
bit-identical cross-engine results (see tpch_q1_like,
suite/olap.py:29). The closed forms

    slope     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)
    intercept = (Σy − slope·Σx) / n

are evaluated with the same association on both engines; IEEE
multiply/subtract/divide on identical operands is correctly rounded and
therefore bit-portable. Groups with zero x-variance emit NULLs (the
fit is undefined), guarded identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: fixed-point grid for the per-row casts: 4 fractional digits holds the
#: fixture's money/quantity doubles exactly; products land on an 8-digit
#: grid. 30 integer digits of headroom in the decimal(38,8) sums absorb
#: ~1e12 rows of 1e6-magnitude products before overflow — beyond the
#: 100 TB operating point.
_X_DEC = "decimal(18,4)"
_PROD_DEC = "decimal(38,8)"
_SUM_DEC = "decimal(38,8)"


def ols_by_group(
    df: DataFrame,
    keys: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group OLS fit of ``y_col`` on ``x_col``.

    Returns one row per group: the keys, ``n`` (long), and
    ``slope`` / ``intercept`` doubles (NULL when x is constant in the
    group). Plan: one hash aggregation (partial + final), then narrow
    per-group projections — no joins, no windows, no second shuffle.
    """
    x = F.col(x_col).cast(_X_DEC)
    y = F.col(y_col).cast(_X_DEC)
    agg = df.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x).cast(_SUM_DEC).cast("double").alias("sum_x"),
        F.sum(y).cast(_SUM_DEC).cast("double").alias("sum_y"),
        F.sum((x * y).cast(_PROD_DEC)).cast(_SUM_DEC).cast("double").alias("sum_xy"),
        F.sum((x * x).cast(_PROD_DEC)).cast(_SUM_DEC).cast("double").alias("sum_xx"),
    )
    nd = F.col("n").cast("double")
    den = nd * F.col("sum_xx") - F.col("sum_x") * F.col("sum_x")
    slope = F.when(
        den != F.lit(0.0),
        (nd * F.col("sum_xy") - F.col("sum_x") * F.col("sum_y")) / den,
    )
    out = agg.withColumn("slope", slope).withColumn(
        "intercept",
        F.when(
            F.col("slope").isNotNull(),
            (F.col("sum_y") - F.col("slope") * F.col("sum_x")) / nd,
        ),
    )
    return out.select(*keys, "n", "slope", "intercept")


def oracle_sql(
    table: str,
    keys: list[str],
    x_col: str,
    y_col: str,
) -> str:
    """DuckDB twin of :func:`ols_by_group` — same decimal grid, same
    floating-point association, same zero-variance guard."""
    ks = ", ".join(keys)
    return f"""
WITH s AS (
  SELECT {ks},
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(CAST({x_col} AS DECIMAL(18,4))) AS DECIMAL(38,8)) AS DOUBLE) AS sum_x,
         CAST(CAST(SUM(CAST({y_col} AS DECIMAL(18,4))) AS DECIMAL(38,8)) AS DOUBLE) AS sum_y,
         CAST(CAST(SUM(CAST(CAST({x_col} AS DECIMAL(18,4)) * CAST({y_col} AS DECIMAL(18,4)) AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS DOUBLE) AS sum_xy,
         CAST(CAST(SUM(CAST(CAST({x_col} AS DECIMAL(18,4)) * CAST({x_col} AS DECIMAL(18,4)) AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS DOUBLE) AS sum_xx
  FROM {table} GROUP BY {ks}),
f AS (
  SELECT {ks}, n, sum_x, sum_y,
         CASE WHEN CAST(n AS DOUBLE) * sum_xx - sum_x * sum_x <> 0.0
              THEN (CAST(n AS DOUBLE) * sum_xy - sum_x * sum_y)
                   / (CAST(n AS DOUBLE) * sum_xx - sum_x * sum_x)
         END AS slope
  FROM s)
SELECT {ks}, n, slope,
       CASE WHEN slope IS NOT NULL
            THEN (sum_y - slope * sum_x) / CAST(n AS DOUBLE)
       END AS intercept
FROM f
"""
