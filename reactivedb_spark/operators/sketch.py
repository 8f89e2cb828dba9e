"""Distributed cardinality sketches (HyperLogLog) with cross-engine
deterministic hashing.

Spark's built-in ``approx_count_distinct`` is a fine HLL++ — but its
hash (xxhash64 of Spark's internal binary row format) is not
reproducible outside the JVM, so no external oracle can check it and
two engines can't merge sketches. This module builds the sketch from
the portable md5→int64 trick the dedup/sampling family already uses:
every engine that has ``md5`` computes bit-identical bucket/rho pairs,
so sketches are mergeable across engines and the final estimate is a
single double division (bit-identical everywhere).

Scale design: the sketch is two partial-aggregable ``groupBy`` steps —
``(group, bucket) → max(rho)`` then ``group → sum/count`` — i.e. the
same map-side-combine economics as any count(*): state per group is at
most ``m`` (256) longs, no skew sensitivity, no shuffle wider than the
final group keys. That is the whole point of HLL at 100 TB: a
distinct-count over billions of keys travels as 256 longs per group.

No analogue in the reference engine (its aggregations are exact memo
folds, reactive_db/src/transform.rs:229-275); this is part of the
training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# m = 2^8 buckets → standard error 1.04/sqrt(256) ≈ 6.5%
M = 256
_ALPHA = 0.7213 / (1 + 1.079 / M)
# Estimator numerator alpha * m^2 * 2^53, precomputed in exact Python
# float so both engines divide the SAME double constant by sum_scaled.
EST_NUM = float(_ALPHA * M * M * (2 ** 53))

# First nonzero hex digit → leading-zero bits inside its 4-bit nibble.
_NIBBLE_LZ = {"1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1, "7": 1,
              "8": 0, "9": 0, "a": 0, "b": 0, "c": 0, "d": 0, "e": 0, "f": 0}


def _hash_hex(col: Column) -> Column:
    """15 hex chars of md5 = 60 portable bits (same as sampling._hash64)."""
    return F.substring(F.md5(col.cast("string")), 1, 15)


def bucket_rho(col: Column) -> tuple[Column, Column]:
    """(bucket, rho) for one value. bucket = low 8 bits; rho = 1-based
    position of the first set bit of the 60-bit hash, computed from hex
    string ops only (leading-'0' run + a 16-way nibble CASE) so DuckDB
    reproduces it exactly. rho caps at 61 (hash == 0)."""
    s = _hash_hex(col)
    h = F.conv(s, 16, 10).cast("long")
    bucket = (h % F.lit(M)).cast("int")
    z = F.length(F.regexp_extract(s, "^0*", 0))
    first = F.substring(F.regexp_replace(s, "^0*", ""), 1, 1)
    nib = F.coalesce(
        *[F.when(first == F.lit(c), F.lit(lz)) for c, lz in _NIBBLE_LZ.items()],
        F.lit(0),
    )
    rho = F.when(z == 15, F.lit(61)).otherwise(z * 4 + nib + 1).cast("int")
    return bucket, rho


def hll_sketch(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """Per-group HLL register table: (group..., bucket, max rho).
    This is the mergeable sketch — union two register tables and
    re-max to merge corpora (or engines)."""
    bucket, rho = bucket_rho(F.col(value_col))
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Collapse a register table to estimates. Exact-integer register
    sum: sum_scaled = Σ 2^(53-rho) (rho>53 contributes 0 — beyond double
    precision anyway and identically dropped by both engines); empty
    buckets contribute 2^53 each. The raw estimate is one double
    division — bit-identical across engines. The returned ``est`` adds
    the standard small-range linear-counting correction (m·ln(m/V) when
    est_raw ≤ 2.5m and V = n_zero > 0) and rounds to an integer: ln()
    is the one op whose libm rounding may differ by 1 ulp across
    engines, and the round() absorbs that (a mismatch needs the true
    value within ~1e-11 of a .5 boundary). ``est_raw`` stays an exact
    double for the bit-exact contract."""
    per_group = registers.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.sum(
            F.when(F.col("rho") <= 53, F.expr("shiftleft(CAST(1 AS BIGINT), 53 - rho)"))
            .otherwise(F.lit(0))
        ).cast("long").alias("sum_nonzero"),
    )
    n_zero = (F.lit(M) - F.col("n_buckets")).cast("long")
    sum_scaled = (F.col("sum_nonzero") + n_zero * F.lit(2 ** 53)).cast("double")
    est_raw = F.lit(EST_NUM) / sum_scaled
    est = F.round(
        F.when(
            (n_zero > 0) & (est_raw <= F.lit(2.5 * M)),
            F.lit(float(M)) * F.log(F.lit(float(M)) / n_zero.cast("double")),
        ).otherwise(est_raw)
    ).cast("long")
    return per_group.select(
        *group_cols,
        n_zero.alias("n_zero"),
        F.col("sum_nonzero"),
        est_raw.alias("est_raw"),
        est.alias("est"),
    )


def hll_distinct(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """groupBy(group_cols).approxDistinct(value_col) as a two-level
    aggregation; see module docstring for the plan shape."""
    return hll_estimate(hll_sketch(df, group_cols, value_col), group_cols)


def oracle_sql(table: str, group_cols: list[str], value_col: str) -> str:
    """The DuckDB twin of hll_distinct — the same register algebra in
    portable SQL (generated, so the constants can't drift)."""
    g = ", ".join(group_cols)
    cases = " ".join(
        f"WHEN '{c}' THEN {lz}" for c, lz in _NIBBLE_LZ.items()
    )
    return f"""
WITH h AS (
  SELECT {g},
         substr(md5(CAST({value_col} AS VARCHAR)), 1, 15) AS s
  FROM {table}),
br AS (
  SELECT {g},
         CAST(('0x' || s)::BIGINT % {M} AS INTEGER) AS bucket,
         CASE WHEN length(regexp_extract(s, '^0*')) = 15 THEN 61
              ELSE length(regexp_extract(s, '^0*')) * 4
                   + (CASE substr(regexp_replace(s, '^0*', ''), 1, 1)
                      {cases} ELSE 0 END) + 1 END AS rho
  FROM h),
reg AS (
  SELECT {g}, bucket, max(rho) AS rho FROM br GROUP BY {g}, bucket),
est AS (
  SELECT {g},
         CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum(CASE WHEN rho <= 53 THEN (1::BIGINT << (53 - rho)) ELSE 0 END) AS BIGINT)
           AS sum_nonzero
  FROM reg GROUP BY {g})
SELECT {g}, n_zero, sum_nonzero, est_raw,
       CAST(round(CASE WHEN n_zero > 0 AND est_raw <= {2.5 * M!r}
                       THEN {float(M)!r} * ln({float(M)!r} / CAST(n_zero AS DOUBLE))
                       ELSE est_raw END) AS BIGINT) AS est
FROM (
  SELECT {g},
         CAST({M} - n_buckets AS BIGINT) AS n_zero,
         sum_nonzero,
         {EST_NUM!r} / CAST(sum_nonzero + ({M} - n_buckets) * {2 ** 53}::BIGINT AS DOUBLE)
           AS est_raw
  FROM est)
"""


# ---------------------------------------------------------------------------
# Count-min sketch (frequency estimation / heavy hitters)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_pos(col: Column, i: int, width: int) -> Column:
    """Row-``i`` cell position: the same portable md5→int64 trick as the
    HLL/dedup families, seeded per row, reduced mod width."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"c{i}_"), col.cast("string"))), 1, 15),
            16, 10,
        ).cast("long") % width
    )


def cms_sketch(df: DataFrame, value_col: str,
               depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Count-min sketch of the value stream (WITH multiplicity):
    (row, pos, cnt) cells, at most ``depth × width`` rows total.

    One narrow explode (depth structs per value) and one partial-
    aggregable groupBy — map-side combine collapses each partition to
    ≤ d·w cells before the shuffle, so a frequency summary of billions
    of rows travels as a few thousand longs. Cells are MERGEABLE by
    (row, pos) sum: union two sketch tables and re-sum to combine
    corpora or engines (same merge algebra as the HLL register table).
    """
    rows = F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            _cms_pos(F.col(value_col), i, width).alias("pos"),
        )
        for i in range(1, depth + 1)
    ])
    return (
        df.select(F.explode(rows).alias("c"))
        .select(F.col("c.row").alias("row"), F.col("c.pos").alias("pos"))
        .groupBy("row", "pos")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, items: DataFrame, item_col: str,
                 depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """(item, est): the classic min-over-rows point estimate for each
    item — an overestimate-only bound (est ≥ true count, within εN with
    probability 1-δ for d=ln(1/δ), w=e/ε).

    The sketch side is broadcast: bounded by construction at d·w cells
    (a few KB) regardless of corpus size, so the estimate pass is
    map-side against the item stream — no corpus-sized shuffle."""
    probes = items.select(
        F.col(item_col),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("row"),
                     _cms_pos(F.col(item_col), i, width).alias("pos"))
            for i in range(1, depth + 1)
        ])).alias("c"),
    ).select(item_col, F.col("c.row").alias("row"), F.col("c.pos").alias("pos"))
    joined = probes.join(F.broadcast(sketch), ["row", "pos"], "left")
    return joined.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est")
    )


def cms_topk(df: DataFrame, value_col: str, k: int = 20,
             depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Heavy hitters: estimated counts of the distinct values, top-k by
    (est desc, value asc) — deterministic total order. The candidate set
    here is the distinct value relation; a production pipeline at 100 TB
    feeds a pre-filtered candidate stream instead (the sketch itself
    never stores values, which is the point).

    Plan: the naive shape (``cms_sketch`` over the multiplicity stream
    + a separate ``distinct`` for the probe side) pays ``depth`` md5s
    per value OCCURRENCE plus a second pass over the stream. Since cell
    counts are additive, the same sketch falls out of the (value, n)
    word-count relation — one partial-aggregable groupBy over the
    stream (the shuffle the probe side needed anyway; Catalyst reuses
    the exchange for both branches), then ``depth`` md5s per DISTINCT
    value and a Σn-weighted cell sum. Byte-identical estimates (Σ
    occurrences landing in a cell == Σ n of the distinct values landing
    there; every probe's cells exist by construction); the md5+explode
    work drops by the occurrences/vocabulary ratio."""
    counts = df.groupBy(value_col).agg(F.count("*").cast("long").alias("_n"))
    pos_tab = counts.select(
        value_col,
        "_n",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("row"),
                     _cms_pos(F.col(value_col), i, width).alias("pos"))
            for i in range(1, depth + 1)
        ])).alias("c"),
    ).select(value_col, "_n", F.col("c.row").alias("row"), F.col("c.pos").alias("pos"))
    cells = pos_tab.groupBy("row", "pos").agg(F.sum("_n").cast("long").alias("cnt"))
    est = (
        pos_tab.drop("_n")
        .join(F.broadcast(cells), ["row", "pos"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )
    return est.orderBy(F.col("est").desc(), F.col(value_col)).limit(k)
