"""Time-weighted aggregation over step-function signals — the
time-series primitive behind "average balance over the period" /
"mean concurrent load": each observation holds its value until the
next one, and the aggregate weights values by how LONG they held, not
how often they were sampled.

Determinism contract (suite conventions): timestamps are integer ns;
values are snapped to a declared fixed-point grid (``scale`` decimal
digits) with floor — both engines evaluate the identical IEEE
``floor(value * 10^scale)`` — then every product and sum runs in
DECIMAL(38,0)/long integers (exact, order-independent), and the final
average is ONE double division of two exactly-computed operands.

100 TB shape: one per-key window (lead) to close intervals, one keyed
aggregation. Nothing global, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    scale: int = 2,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key time-weighted average of a step signal: intervals are
    [ts_i, ts_{i+1}) per key in (ts asc, tiebreak asc) order — pass
    ``tiebreak_cols`` making the order total, or tied timestamps pick
    an engine-dependent holder. The trailing observation (no successor)
    carries no duration and drops out, as does any key with a single
    observation. Emits (key..., held_ns long, twa double)."""
    mult = 10 ** scale
    order = [F.col("_ts")] + [F.col(c) for c in (tiebreak_cols or [])]
    iv = (
        df.select(
            *key_cols,
            *(tiebreak_cols or []),
            F.col(ts_col).alias("_ts"),
            F.floor(F.col(value_col) * F.lit(mult)).alias("_vgrid"),
        )
        .withColumn("_next", F.lead("_ts").over(
            Window.partitionBy(*key_cols).orderBy(*order)))
        .filter(F.col("_next").isNotNull())
        .withColumn("_dur", F.col("_next") - F.col("_ts"))
    )
    # DECIMAL(19,0) x DECIMAL(19,0) -> DECIMAL(38,0) lands exactly on
    # both engines' 38-digit cap (DuckDB errors past it; Spark silently
    # widens-then-caps) — the portable way to write an exact i64 x i64
    # product; the oracle mirrors the same explicit casts.
    agg = iv.groupBy(*key_cols).agg(
        F.sum(F.col("_vgrid").cast("decimal(19,0)")
              * F.col("_dur").cast("decimal(19,0)"))
        .alias("_vd"),
        F.sum("_dur").cast("long").alias("held_ns"),
    )
    return agg.select(
        *key_cols,
        "held_ns",
        (F.col("_vd").cast("double")
         / (F.col("held_ns").cast("double") * F.lit(float(mult))))
        .alias("twa"),
    )
