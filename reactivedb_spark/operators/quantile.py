"""Mergeable histogram quantile sketch — approximate per-group
percentiles without a sort.

Completes the distributed-sketch family (HLL cardinality in
``sketch.hll_*``, count-min frequency in ``sketch.cms_*``, Bloom
membership in ``bloom``): the classic way to answer "p95 of this
column per group" over 100 TB is NOT a global sort (one total-order
shuffle of the corpus) but a fixed-bin histogram — two
partial-aggregable ``groupBy`` passes whose state per group is bounded
at ``bins`` longs, mergeable across corpora/engines by (group, bin)
count sum, exactly like the HLL register table.

Accuracy contract: the estimate is exact linear interpolation inside
the value's bin, so the error is bounded by one bin width
((max-min)/bins per group — 0.1% of the range at the default 1024).
That is the equal-width-histogram trade: perfect range coverage,
resolution proportional to range (an HDR/log-scale variant trades the
other way but needs libm ``log``, which is the one operation whose
rounding differs across engines — see the ln() note on
``sketch.hll_estimate``).

Cross-engine determinism: the whole pipeline is IEEE-double add/sub/
mul/div plus ``floor``/``least`` — every step bit-identical in any
engine that computes doubles (no libm, no locale, no hash). The DuckDB
oracle replays the algebra verbatim and the driver compares estimates
bit-for-bit.

No analogue in the reference engine (its aggregations are exact memo
folds, reactive_db/src/transform.rs:229-275); this is part of the
training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

HIST_BINS = 1024


def histogram_sketch(df: DataFrame, group_cols: list[str], value_col: str,
                     bins: int = HIST_BINS) -> DataFrame:
    """Per-group fixed-width histogram: (group..., bin, cnt, vmin, w, n).

    Pass 1 computes per-group (min, max, count) — one map-side-combinable
    aggregation; pass 2 bins every value against its group's broadcast
    range — a second map-side-combinable aggregation whose post-shuffle
    state is ≤ ``bins`` rows per group. NULL values are excluded (both
    passes filter them identically — the same contract as percentile
    aggregates), and so are NULL GROUP KEYS (made explicit here rather
    than left to the null-unsafe equi-join, which would drop them
    silently on the range join). Degenerate groups (max == min) land
    everything in bin 0.

    The (vmin, w, n) columns are constant within a group and carried on
    every row so the sketch is self-describing: union two sketch tables
    OVER THE SAME RANGES and re-sum cnt by (group, bin) to merge
    sub-corpus histograms, recomputing n as the group's cnt total (n is
    always derivable — it rides along for estimator convenience; the
    merge law is pinned by test_histogram_merges_by_cnt_sum). Merging
    across different ranges requires re-binning, i.e. a coarser shared
    grid — not provided here.
    """
    vals = df.filter(F.col(value_col).isNotNull())
    for g in group_cols:
        vals = vals.filter(F.col(g).isNotNull())
    rng = vals.groupBy(*group_cols).agg(
        F.min(value_col).cast("double").alias("vmin"),
        F.max(value_col).cast("double").alias("vmax"),
        F.count("*").cast("long").alias("n"),
    )
    j = vals.join(F.broadcast(rng), group_cols)
    w = (F.col("vmax") - F.col("vmin")) / F.lit(float(bins))
    bin_col = F.when(F.col("vmax") == F.col("vmin"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col(value_col).cast("double") - F.col("vmin")) / w),
            F.lit(bins - 1),
        )
    ).cast("int")
    return (
        j.select(*group_cols, bin_col.alias("bin"), "vmin",
                 w.alias("w"), "n")
        .groupBy(*group_cols, "bin", "vmin", "w", "n")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def quantile_estimate(hist: DataFrame, group_cols: list[str],
                      qs: list[float]) -> DataFrame:
    """(group..., q, est): linear-interpolated quantile estimates from a
    ``histogram_sketch`` table.

    Rule (replayed verbatim by the oracle): target rank = q·n; the
    estimate lives in the first bin whose cumulative count reaches the
    target, at ``vmin + w·bin + w·(target − cum_before)/cnt`` — plain
    double arithmetic, deterministic tie behavior (cum ≥ target picks
    the lowest such bin; q must be in (0, 1]). A degenerate group
    (w == 0) estimates vmin for every q. The per-group work is over ≤
    ``bins`` sketch rows — the corpus itself is never touched again.
    """
    win = (
        Window.partitionBy(*group_cols).orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(win))
    qdf = cum.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    # broadcast-singleton cross join: the q relation is len(qs) rows and
    # the sketch side is <= bins rows per group — never corpus-sized
    x = cum.crossJoin(F.broadcast(qdf))
    target = F.col("q") * F.col("n").cast("double")
    hit = x.filter(F.col("cum").cast("double") >= target)
    pick = Window.partitionBy(*group_cols, "q").orderBy("bin")
    first = (
        hit.withColumn("_rk", F.row_number().over(pick))
        .filter(F.col("_rk") == 1)
    )
    est = F.when(F.col("w") == 0.0, F.col("vmin")).otherwise(
        F.col("vmin")
        + F.col("w") * F.col("bin").cast("double")
        + F.col("w")
        * (target - (F.col("cum") - F.col("cnt")).cast("double"))
        / F.col("cnt").cast("double")
    )
    return first.select(*group_cols, "q", est.alias("est"))


def approx_quantiles(df: DataFrame, group_cols: list[str], value_col: str,
                     qs: list[float], bins: int = HIST_BINS) -> DataFrame:
    """Per-group approximate quantiles in two linear passes; see module
    docstring for the scale/accuracy contract."""
    return quantile_estimate(
        histogram_sketch(df, group_cols, value_col, bins), group_cols, qs)


def oracle_sql(table: str, group_col: str, value_col: str,
               qs: list[float], bins: int = HIST_BINS) -> str:
    """The DuckDB twin — identical binning and interpolation algebra."""
    # CAST each literal: a bare VALUES (0.95) row is typed DECIMAL in
    # DuckDB, whose exact 0.95 compares UNEQUAL to the Spark side's
    # double q column (fetchall() hands back Decimal, and only literals
    # exactly representable in binary survive the numeric comparison)
    q_values = ", ".join(f"(CAST({q!r} AS DOUBLE))" for q in qs)
    return f"""
WITH vals AS (
  SELECT {group_col} AS g, CAST({value_col} AS DOUBLE) AS v
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {group_col} IS NOT NULL),
rng AS (
  SELECT g, CAST(min(v) AS DOUBLE) AS vmin, CAST(max(v) AS DOUBLE) AS vmax,
         CAST(count(*) AS BIGINT) AS n
  FROM vals GROUP BY g),
binned AS (
  SELECT vals.g,
         CASE WHEN vmax = vmin THEN 0
              ELSE CAST(least(floor((v - vmin) / ((vmax - vmin) / {float(bins)!r})),
                              {bins - 1}) AS INTEGER) END AS bin,
         vmin, (vmax - vmin) / {float(bins)!r} AS w, n
  FROM vals JOIN rng ON rng.g = vals.g),
hist AS (
  SELECT g, bin, vmin, w, n, CAST(count(*) AS BIGINT) AS cnt
  FROM binned GROUP BY g, bin, vmin, w, n),
cum AS (
  SELECT g, bin, vmin, w, n, cnt,
         sum(cnt) OVER (PARTITION BY g ORDER BY bin) AS cum
  FROM hist),
qs(q) AS (VALUES {q_values}),
hit AS (
  SELECT g, q, bin, vmin, w, n, cnt, cum,
         row_number() OVER (PARTITION BY g, q ORDER BY bin) AS rk
  FROM cum CROSS JOIN qs
  WHERE CAST(cum AS DOUBLE) >= q * CAST(n AS DOUBLE))
SELECT g AS {group_col}, q,
       CASE WHEN w = 0 THEN vmin
            ELSE vmin + w * CAST(bin AS DOUBLE)
                 + w * (q * CAST(n AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
                   / CAST(cnt AS DOUBLE) END AS est
FROM hit WHERE rk = 1
"""
