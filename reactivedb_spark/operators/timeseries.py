"""Time-series resampling, gap filling, and rolling-window aggregates.

The hypertable/continuous-rollup operator family (TimescaleDB
`time_bucket_gapfill` + `locf`, Flink windowed aggregates) re-expressed
as Spark keyed windows — no per-key driver loop, no UDF.

Scale notes (100 TB):
- ``resample`` is two keyed shuffles: one window to pick each bucket's
  representative row, one window for the forward fill. The gap grid is
  generated per key with ``sequence()`` — its width is (key time span /
  interval), so the caller picks the interval to bound it (a 1-year
  span at 1-hour buckets is 8,760 grid rows per key; the explode
  distributes with the key's partition).
- ``rolling`` is one keyed window with a ROWS frame; Spark keeps the
  frame in the window buffer — no self-join, no shuffle beyond the key
  partitioning.

Determinism: bucket math is integer division of epoch-ns; rolling sums
cast the measure to DECIMAL(18,6) first (exact accumulation — DuckDB's
segment-tree window sums would otherwise order FP adds differently
than Spark's buffer walk); averages are one final double division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window as W


def resample(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    id_col: str,
    interval_ns: int,
) -> DataFrame:
    """Per-key last-observation resampling onto a regular grid with
    forward fill (locf). ``time_col`` is int64 epoch-ns (non-negative:
    bucket assignment is integer ``div``). Each bucket's representative
    is its latest row by (time, id) — id breaks ties so both engines
    bin identically. Buckets between a key's first and last observation
    with no rows are emitted with the previous bucket's value and
    ``filled = true``.

    Returns (key, bucket, bucket_start_ns, value, filled).
    """
    b = df.select(
        F.col(key_col).alias("key"),
        F.expr(f"{time_col} div {interval_ns}").cast("long").alias("bucket"),
        F.col(time_col).alias("_t"),
        F.col(id_col).alias("_id"),
        F.col(value_col).alias("value"),
    )
    pick = W.partitionBy("key", "bucket").orderBy(F.desc("_t"), F.desc("_id"))
    observed = (
        b.withColumn("_rn", F.row_number().over(pick))
        .filter(F.col("_rn") == 1)
        .select("key", "bucket", "value")
    )
    spans = observed.groupBy("key").agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    grid = spans.select(
        "key", F.explode(F.sequence("_lo", "_hi")).alias("bucket")
    )
    ffill = (
        W.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(observed, ["key", "bucket"], "left")
        .select(
            "key",
            "bucket",
            (F.col("bucket") * F.lit(interval_ns)).cast("long").alias("bucket_start_ns"),
            F.last("value", ignorenulls=True).over(ffill).alias("value"),
            F.col("value").isNull().alias("filled"),
        )
    )


def resample_oracle_sql(
    src: str,
    key_col: str,
    time_expr: str,
    value_col: str,
    id_col: str,
    interval_ns: int,
) -> str:
    """DuckDB twin of :func:`resample` (``time_expr`` must yield the
    same epoch-ns integer the Spark side reads)."""
    return f"""
WITH b AS (
  SELECT {key_col} AS key, ({time_expr}) // {interval_ns} AS bucket,
         ({time_expr}) AS t, {id_col} AS id, {value_col} AS value
  FROM {src}),
observed AS (
  SELECT key, bucket, value FROM (
    SELECT key, bucket, value,
           row_number() OVER (PARTITION BY key, bucket ORDER BY t DESC, id DESC) AS rn
    FROM b) WHERE rn = 1),
grid AS (
  SELECT key, unnest(range(min(bucket), max(bucket) + 1)) AS bucket
  FROM observed GROUP BY key)
SELECT g.key, g.bucket,
       CAST(g.bucket * {interval_ns} AS BIGINT) AS bucket_start_ns,
       last_value(o.value IGNORE NULLS) OVER (
         PARTITION BY g.key ORDER BY g.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       o.value IS NULL AS filled
FROM grid g LEFT JOIN observed o ON o.key = g.key AND o.bucket = g.bucket
"""


def rolling(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    n: int,
) -> DataFrame:
    """Moving aggregates over the trailing ``n`` rows per key (the
    current row and ``n - 1`` predecessors), ordered by ``order_cols``
    (which must be a deterministic total order within each key — include
    a unique id). Adds ``roll_n``, ``roll_sum``, ``roll_avg``,
    ``roll_min``, ``roll_max`` columns; the sum accumulates exactly as
    DECIMAL(18,6) and is emitted as double."""
    w = (
        W.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-(n - 1), W.currentRow)
    )
    dec = F.col(value_col).cast("decimal(18,6)")
    roll_sum = F.sum(dec).over(w).cast("decimal(38,6)")
    cnt = F.count(F.lit(1)).over(w).cast("long")
    return df.select(
        "*",
        cnt.alias("roll_n"),
        roll_sum.cast("double").alias("roll_sum"),
        (roll_sum.cast("double") / cnt).alias("roll_avg"),
        F.min(value_col).over(w).alias("roll_min"),
        F.max(value_col).over(w).alias("roll_max"),
    )
