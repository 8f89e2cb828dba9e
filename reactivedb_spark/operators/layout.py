"""File-layout optimization: z-order clustering for multi-column data
skipping.

At 100 TB the scan you avoid is worth more than the scan you speed up:
parquet readers prune row groups / files whose min-max footer stats
exclude the predicate. Range-partitioning by a single key gives perfect
pruning on that key and none on any other; interleaving the bits of two
keys (a Morton / z-curve) gives *both* columns locality, so files hold
tight ranges in every interleaved dimension and selective predicates on
either column skip most files.

``zorder_write`` is deliberately plain Spark: compute the z-value as a
column expression (JVM-side bit arithmetic — no UDF), range-repartition
on it (one skew-aware shuffle: Spark samples the z distribution), sort
within partitions, write parquet. Readers need no special support —
pruning falls out of ordinary footer stats, exactly how Delta/Iceberg
OPTIMIZE ZORDER interacts with their readers.

Determinism note: this is a LAYOUT operator — it changes bytes-on-disk
clustering, never query results; tests assert the skipping property
(per-file min-max width vs a single-column layout), not row values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

Z_BITS = 21  # per-dimension bits: 2 dims × 21 = 42-bit z-value < 2^63


def _normalize_to_bits(col: Column, lo: Column, hi: Column, bits: int = Z_BITS) -> Column:
    """Rank-free normalization of a long column onto [0, 2^bits): linear
    min-max scaling — one pass, no sort. (Quantile-based normalization
    resists skew better but costs a rank; callers with pathological skew
    can pre-rank.)"""
    span = F.greatest(hi - lo, F.lit(1)).cast("double")
    scaled = ((col - lo).cast("double") / span) * F.lit(float((1 << bits) - 1))
    return F.least(
        F.lit((1 << bits) - 1).cast("long"),
        F.greatest(F.lit(0).cast("long"), F.round(scaled).cast("long")),
    )


def _interleave(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of two ``bits``-bit longs via shift-or terms —
    a closed-form column expression (2·bits shifts), fully JVM-side."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def zvalue(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Adds ``_z``: the Morton code of the two (numeric) columns,
    min-max normalized to 21 bits each. One aggregation for the bounds
    (4 longs to the driver), then a narrow per-row expression."""
    bounds = df.agg(
        F.min(F.col(col_a).cast("long")).alias("alo"),
        F.max(F.col(col_a).cast("long")).alias("ahi"),
        F.min(F.col(col_b).cast("long")).alias("blo"),
        F.max(F.col(col_b).cast("long")).alias("bhi"),
    ).collect()[0]
    a = _normalize_to_bits(
        F.col(col_a).cast("long"), F.lit(int(bounds["alo"])), F.lit(int(bounds["ahi"]))
    )
    b = _normalize_to_bits(
        F.col(col_b).cast("long"), F.lit(int(bounds["blo"])), F.lit(int(bounds["bhi"]))
    )
    return df.withColumn("_z", _interleave(a, b))


def zorder_write(df: DataFrame, col_a: str, col_b: str, path: str,
                 n_files: int = 8) -> None:
    """Write ``df`` as ``n_files`` parquet files z-clustered on
    (col_a, col_b): range-repartition + in-partition sort on the Morton
    code (the `_z` helper column is dropped before writing). Point/range
    predicates on EITHER column then prune most files from ordinary
    parquet footer stats."""
    out = zvalue(df, col_a, col_b)
    (
        out.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
