"""Missing-value imputation — the data-repair stage of a training
pipeline (fill numeric gaps with the group mean, categorical gaps with
the group mode) as pure keyed aggregations + joins.

Determinism contract (oracle-replayed):

- numeric mean is computed from an EXACT decimal sum divided once at
  the end (``CAST(sum AS DOUBLE) / CAST(n AS DOUBLE)``) — no float
  accumulation order, bit-identical across engines;
- categorical mode ties break deterministically: highest count, then
  lexicographically smallest value;
- groups with NO observed value fall back to the GLOBAL mean/mode
  (same exactness rules); a fully-NULL column stays NULL.

Plan shape (100 TB): one hash aggregation per imputed column family
(partial-aggregable), the per-group statistics relation is
#groups-sized and joins back keyed on the group columns — broadcast
when small, shuffle co-partitioned otherwise (AQE decides); the global
fallback is a 1-row cross join. No windows, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEC = "decimal(38,6)"


def impute(df: DataFrame, group_cols: list, numeric_cols: list = (),
           categorical_cols: list = ()) -> DataFrame:
    """Fill NULLs in ``numeric_cols`` with the exact group mean (global
    mean when the whole group is NULL) and in ``categorical_cols`` with
    the deterministic group mode (global mode fallback)."""
    out = df
    if numeric_cols:
        aggs = []
        gaggs = []
        for c in numeric_cols:
            aggs += [
                F.sum(F.col(c).cast(_DEC)).alias(f"_s_{c}"),
                F.count(F.col(c)).alias(f"_n_{c}"),
            ]
            gaggs += [
                F.sum(F.col(c).cast(_DEC)).alias(f"_gs_{c}"),
                F.count(F.col(c)).alias(f"_gn_{c}"),
            ]
        means = df.groupBy(*group_cols).agg(*aggs).select(
            *group_cols,
            *[
                (F.col(f"_s_{c}").cast("double")
                 / F.col(f"_n_{c}").cast("double")).alias(f"_mean_{c}")
                for c in numeric_cols
            ],
        )
        gmeans = df.agg(*gaggs).select(
            *[
                (F.col(f"_gs_{c}").cast("double")
                 / F.col(f"_gn_{c}").cast("double")).alias(f"_gmean_{c}")
                for c in numeric_cols
            ],
        )
        out = out.join(means, list(group_cols), "left").crossJoin(
            F.broadcast(gmeans)
        )
        for c in numeric_cols:
            # imputed numeric columns are emitted as DOUBLE (the mean is
            # fractional even over int columns) — declared in the contract
            out = out.withColumn(
                c,
                F.coalesce(
                    F.col(c).cast("double"),
                    F.col(f"_mean_{c}"),
                    F.col(f"_gmean_{c}"),
                ),
            )
        out = out.drop(
            *[f"_mean_{c}" for c in numeric_cols],
            *[f"_gmean_{c}" for c in numeric_cols],
        )
    for c in categorical_cols:
        counted = (
            df.filter(F.col(c).isNotNull())
            .groupBy(*group_cols, c)
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        # argmax with (count desc, value asc) tie-break via min over an
        # orderable struct (negated count) — one more hash aggregation
        mode = counted.groupBy(*group_cols).agg(
            F.min(F.struct((-F.col("_n")).alias("_neg"),
                           F.col(c).alias("_v"))).alias("_m")
        ).select(*group_cols, F.col("_m._v").alias(f"_mode_{c}"))
        gmode = (
            df.filter(F.col(c).isNotNull())
            .groupBy(c).agg(F.count(F.lit(1)).alias("_n"))
            .agg(F.min(F.struct((-F.col("_n")).alias("_neg"),
                                F.col(c).alias("_v"))).alias("_m"))
            .select(F.col("_m._v").alias(f"_gmode_{c}"))
        )
        out = out.join(mode, list(group_cols), "left").crossJoin(
            F.broadcast(gmode)
        )
        out = out.withColumn(
            c, F.coalesce(F.col(c), F.col(f"_mode_{c}"), F.col(f"_gmode_{c}"))
        ).drop(f"_mode_{c}", f"_gmode_{c}")
    return out.select(*df.columns)
