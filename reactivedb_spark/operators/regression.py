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
#: fixture's money/quantity doubles exactly; width 15 (not 18) so the
#: per-row PRODUCT type is decimal(30,8) — inside DuckDB's int128
#: multiply path (two width-18 operands overflow its int64 product on
#: squared prices). Same scale = same grid = identical values; 30
#: integer digits of sum headroom absorb ~1e12 rows of 1e6-magnitude
#: products — beyond the 100 TB operating point.
_X_DEC = "decimal(15,4)"
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
         CAST(CAST(SUM(CAST({x_col} AS DECIMAL(15,4))) AS DECIMAL(38,8)) AS DOUBLE) AS sum_x,
         CAST(CAST(SUM(CAST({y_col} AS DECIMAL(15,4))) AS DECIMAL(38,8)) AS DOUBLE) AS sum_y,
         CAST(CAST(SUM(CAST(CAST({x_col} AS DECIMAL(24,4)) * CAST({y_col} AS DECIMAL(15,4)) AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS DOUBLE) AS sum_xy,
         CAST(CAST(SUM(CAST(CAST({x_col} AS DECIMAL(24,4)) * CAST({x_col} AS DECIMAL(15,4)) AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS DOUBLE) AS sum_xx
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


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations of ``cols`` in ONE pass — the
    whole matrix is a single hash aggregation of exact-decimal
    sufficient statistics (n, Σx per column, Σxy per pair), unpivoted
    to one row per unordered pair. Spark's builtin ``corr`` aggregates
    in doubles (partition-order-dependent); this is the order-proof
    formulation, same recipe as :func:`ols_by_group`.

    The only libm call is the final ``sqrt`` of the variance product —
    IEEE 754 requires sqrt to be correctly rounded, so unlike ln/exp it
    is bit-portable cross-engine. Pairs with zero variance on either
    side emit NULL. Plan: one Exchange (the global aggregate), then a
    constant-width projection — a SUM's cost at any scale.
    """
    if len(cols) < 2:
        raise ValueError("corr_matrix: need at least two columns")
    dec = [F.col(c).cast(_X_DEC) for c in cols]
    aggs = [F.count("*").cast("long").alias("n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(dec[i]).cast(_SUM_DEC).cast("double").alias(f"s_{i}"))
        aggs.append(
            F.sum((dec[i] * dec[i]).cast(_PROD_DEC)).cast(_SUM_DEC)
            .cast("double").alias(f"ss_{i}_{i}")
        )
    pairs = [(i, j) for i in range(len(cols)) for j in range(i + 1, len(cols))]
    for i, j in pairs:
        aggs.append(
            F.sum((dec[i] * dec[j]).cast(_PROD_DEC)).cast(_SUM_DEC)
            .cast("double").alias(f"ss_{i}_{j}")
        )
    one = df.agg(*aggs)
    nd = F.col("n").cast("double")
    structs = []
    for i, j in pairs:
        num = nd * F.col(f"ss_{i}_{j}") - F.col(f"s_{i}") * F.col(f"s_{j}")
        da = nd * F.col(f"ss_{i}_{i}") - F.col(f"s_{i}") * F.col(f"s_{i}")
        db = nd * F.col(f"ss_{j}_{j}") - F.col(f"s_{j}") * F.col(f"s_{j}")
        corr = F.when((da > 0) & (db > 0), num / F.sqrt(da * db))
        structs.append(F.struct(
            F.lit(cols[i]).alias("col_a"), F.lit(cols[j]).alias("col_b"),
            F.col("n").alias("n"), corr.alias("corr"),
        ))
    # one inline() over the single agg row — the matrix unpivots in a
    # single projection, never re-running the aggregate per pair
    return one.select(F.inline(F.array(*structs)))


def corr_oracle_sql(table: str, cols: list[str]) -> str:
    """DuckDB twin of :func:`corr_matrix` — identical decimal grid,
    float association, and zero-variance guard, unpivoted the same way."""
    def dc(c):
        return f"CAST({c} AS DECIMAL(15,4))"

    def dw(c):
        # wide twin for the LEFT product operand: same 1e-4 grid, but
        # int128 storage so DuckDB's multiply never overflows a
        # width-capped intermediate (squared prices broke DECIMAL(18))
        return f"CAST({c} AS DECIMAL(24,4))"

    sums = [f"CAST(COUNT(*) AS BIGINT) AS n"]
    for i, c in enumerate(cols):
        sums.append(
            f"CAST(CAST(SUM({dc(c)}) AS DECIMAL(38,8)) AS DOUBLE) AS s_{i}")
        sums.append(
            f"CAST(CAST(SUM(CAST({dw(c)} * {dc(c)} AS DECIMAL(38,8)))"
            f" AS DECIMAL(38,8)) AS DOUBLE) AS ss_{i}_{i}")
    pairs = [(i, j) for i in range(len(cols)) for j in range(i + 1, len(cols))]
    for i, j in pairs:
        sums.append(
            f"CAST(CAST(SUM(CAST({dw(cols[i])} * {dc(cols[j])} AS DECIMAL(38,8)))"
            f" AS DECIMAL(38,8)) AS DOUBLE) AS ss_{i}_{j}")
    selects = []
    for i, j in pairs:
        num = f"(CAST(n AS DOUBLE) * ss_{i}_{j} - s_{i} * s_{j})"
        da = f"(CAST(n AS DOUBLE) * ss_{i}_{i} - s_{i} * s_{i})"
        db = f"(CAST(n AS DOUBLE) * ss_{j}_{j} - s_{j} * s_{j})"
        selects.append(
            f"SELECT '{cols[i]}' AS col_a, '{cols[j]}' AS col_b, n, "
            f"CASE WHEN {da} > 0 AND {db} > 0 "
            f"THEN {num} / sqrt({da} * {db}) END AS corr FROM s"
        )
    return ("WITH s AS MATERIALIZED (SELECT " + ", ".join(sums)
            + f" FROM {table})\n" + "\nUNION ALL\n".join(selects))
