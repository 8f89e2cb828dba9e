"""Numeric distribution operators: fixed-width histograms, rank-based
winsorization, and single-pass column profiling.

All three are one-aggregation plans (plus one keyed window for the
winsorize cuts) built from rank math and exact decimal sums — no
sketches, no interpolation arithmetic, so every result is bit-portable
against any ANSI engine.

Scale notes (100 TB):
- ``histogram``: bin assignment is a per-row scalar expression (pushes
  past the scan's column pruning); the aggregate is partial-aggregable
  with at most ``nbins`` groups — map-side combine collapses each
  partition before the shuffle.
- ``winsorize_sum``: quantile cuts come from ``ntile`` over a window
  PARTITIONED BY the group key — rank math on a keyed sort, the same
  plan class as ``price_deciles``; no global single-partition sort.
- ``profile``: ONE pass over the table computing every column's
  aggregates simultaneously (count/nulls/distinct/min/max), then a
  constant-width unpivot of the single result row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W
from pyspark.sql import types as T


def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """Fixed-width histogram of ``col`` over [lo, hi): bin index
    ``floor((x - lo) / width)`` clamped to [0, nbins-1] (outliers land
    in the edge bins). Emits (bin, bin_lo, n, sum_v) where ``sum_v``
    accumulates exactly as DECIMAL(18,2)→(38,2). ``lo``/``hi`` are
    caller constants — the same IEEE literals appear in the oracle, so
    bin edges are bit-identical cross-engine."""
    width = (hi - lo) / nbins
    x = F.col(col).cast("double")
    raw = F.floor((x - F.lit(lo)) / F.lit(width))
    bin_ = F.least(F.lit(nbins - 1).cast("long"), F.greatest(F.lit(0).cast("long"), raw))
    return (
        df.select(bin_.alias("bin"), x.alias("v"))
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).cast("decimal(38,2)")
            .cast("double").alias("sum_v"),
        )
        .select(
            "bin",
            (F.lit(lo) + F.col("bin").cast("double") * F.lit(width)).alias("bin_lo"),
            "n",
            "sum_v",
        )
    )


def histogram_oracle_sql(src: str, col: str, lo: float, hi: float, nbins: int) -> str:
    width = (hi - lo) / nbins
    return f"""
WITH b AS (
  SELECT least({nbins - 1}, greatest(0,
           CAST(floor((CAST({col} AS DOUBLE) - {lo!r}) / {width!r}) AS BIGINT))) AS bin,
         CAST({col} AS DOUBLE) AS v
  FROM {src})
SELECT bin, {lo!r} + CAST(bin AS DOUBLE) * {width!r} AS bin_lo,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST(v AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_v
FROM b GROUP BY bin
"""


def winsorize_sum(
    df: DataFrame,
    group_col: str,
    col: str,
    tiebreak_col: str,
    ntiles: int = 20,
) -> DataFrame:
    """Winsorized per-group totals: within each group, values in the
    bottom/top ``1/ntiles`` tail (by ``ntile`` rank, ties broken by
    ``tiebreak_col``) are clipped to the tail-adjacent extremes — the
    robust-mean pattern for outlier-heavy measures. Rank-based cuts
    (max of tile 1 / min of tile ``ntiles``), not interpolated
    percentiles, so the cut values are data elements and bit-portable.
    Emits (group, n, sum_raw, sum_winsor)."""
    w = W.partitionBy(group_col).orderBy(F.col(col), F.col(tiebreak_col))
    tiled = df.select(
        F.col(group_col).alias("grp"),
        F.col(col).cast("double").alias("v"),
        F.ntile(ntiles).over(w).alias("_tile"),
    )
    cuts = tiled.groupBy("grp").agg(
        F.max(F.when(F.col("_tile") == 1, F.col("v"))).alias("_lo_cut"),
        F.min(F.when(F.col("_tile") == ntiles, F.col("v"))).alias("_hi_cut"),
    )
    clipped = (
        tiled.join(cuts, "grp")
        .select(
            "grp",
            "v",
            F.least(F.greatest(F.col("v"), F.col("_lo_cut")), F.col("_hi_cut")).alias("w"),
        )
    )
    return (
        clipped.groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).cast("decimal(38,2)")
            .cast("double").alias("sum_raw"),
            F.sum(F.col("w").cast("decimal(18,2)")).cast("decimal(38,2)")
            .cast("double").alias("sum_winsor"),
        )
        .withColumnRenamed("grp", group_col)
    )


def winsorize_oracle_sql(
    src: str, group_col: str, col: str, tiebreak_col: str, ntiles: int = 20
) -> str:
    return f"""
WITH tiled AS (
  SELECT {group_col} AS grp, CAST({col} AS DOUBLE) AS v,
         ntile({ntiles}) OVER (PARTITION BY {group_col}
                               ORDER BY {col}, {tiebreak_col}) AS tile
  FROM {src}),
cuts AS (
  SELECT grp,
         max(CASE WHEN tile = 1 THEN v END) AS lo_cut,
         min(CASE WHEN tile = {ntiles} THEN v END) AS hi_cut
  FROM tiled GROUP BY grp),
clipped AS (
  SELECT t.grp, t.v, least(greatest(t.v, c.lo_cut), c.hi_cut) AS w
  FROM tiled t JOIN cuts c ON c.grp = t.grp)
SELECT grp AS {group_col}, CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST(v AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_raw,
       CAST(CAST(sum(CAST(w AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_winsor
FROM clipped GROUP BY grp
"""


_NUMERIC = (T.LongType, T.IntegerType, T.ShortType, T.ByteType,
            T.DoubleType, T.FloatType, T.DecimalType)


def profile(df: DataFrame) -> DataFrame:
    """Single-pass data-quality profile: one row per column with
    (col_name, n_rows, n_nulls, n_distinct, min_v, max_v). min/max are
    DOUBLE and only populated for numeric columns (bigints are exact
    below 2^53 in the fixtures; string/date extremes are engine-
    formatting-dependent and deliberately omitted). ONE aggregation
    job — every column's stats are computed in the same pass."""
    aggs: list = [F.count("*").cast("long").alias("_n")]
    for f in df.schema.fields:
        c = f.name
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"{c}__nulls")
        )
        aggs.append(F.count_distinct(F.col(c)).cast("long").alias(f"{c}__dist"))
        is_num = isinstance(f.dataType, _NUMERIC)
        aggs.append(
            (F.min(F.col(c).cast("double")) if is_num else F.lit(None).cast("double"))
            .alias(f"{c}__min")
        )
        aggs.append(
            (F.max(F.col(c).cast("double")) if is_num else F.lit(None).cast("double"))
            .alias(f"{c}__max")
        )
    row = df.agg(*aggs)
    stack_args = []
    for f in df.schema.fields:
        c = f.name
        stack_args.append(f"'{c}', `{c}__nulls`, `{c}__dist`, `{c}__min`, `{c}__max`")
    n_cols = len(df.schema.fields)
    return row.select(
        F.col("_n").alias("n_rows"),
        F.expr(
            f"stack({n_cols}, " + ", ".join(stack_args)
            + ") AS (col_name, n_nulls, n_distinct, min_v, max_v)"
        ),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_v", "max_v")


def profile_oracle_sql(src: str, fields: list[tuple[str, bool]]) -> str:
    """``fields`` is [(column, is_numeric), ...] in schema order."""
    selects = []
    for c, is_num in fields:
        mn = f"min(CAST({c} AS DOUBLE))" if is_num else "CAST(NULL AS DOUBLE)"
        mx = f"max(CAST({c} AS DOUBLE))" if is_num else "CAST(NULL AS DOUBLE)"
        selects.append(
            f"SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, "
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
            f"{mn} AS min_v, {mx} AS max_v FROM {src}"
        )
    return " UNION ALL ".join(selects)


def sigma_outliers(df: DataFrame, group_col: str, col: str,
                   k_sigma: int = 3, scale: int = 100) -> DataFrame:
    """Per-group k-sigma outlier counting with EXACT distributed
    algebra — no sqrt, no FP accumulation, no sketch.

    The test |x − μ| > kσ is evaluated in cross-multiplied integer
    form: (n·x − Σx)² > k²·(n·Σx² − (Σx)²), which is the same
    inequality scaled by n² — every term is an exact integer (values
    enter as ``round(x·scale)`` fixed-point) widened through decimals,
    so the outlier decision is bit-identical in any engine. Two passes
    over the group: one partial-aggregable moment aggregation (3 longs
    per group), one map-side probe against the broadcast moment
    relation.

    Emits (group, n, mean, n_outliers); ``mean`` is the single double
    division Σx/n at the original scale.

    Headroom: with |x|·scale ≤ X and group rows ≤ N, the binding
    constraint is the int64 square sum ``ssq = Σx²``: needs N·X² < 2⁶³
    (and N·X < 2⁶³ for ``s``; the decimal probe terms then need
    (N·X)² < 10³⁸). E.g. X = 10⁷ allows N ≈ 9·10⁴ rows per group;
    X = 10⁴ allows N ≈ 9·10¹⁰. Larger products must pre-scale down
    (smaller ``scale``) or the int64 sums overflow — wrapping silently
    in non-ANSI Spark and erroring in ANSI/DuckDB, so the bound is the
    documented contract, not a soft estimate.
    """
    xl = F.round(F.col(col).cast("double") * scale).cast("long")
    base = df.select(F.col(group_col).alias("grp"), xl.alias("xl"))
    mom = base.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xl").cast("long").alias("s"),
        F.sum(F.col("xl") * F.col("xl")).cast("long").alias("ssq"),
    )
    lhs = (F.col("n") * F.col("xl") - F.col("s")).cast("decimal(19,0)")
    rhs = (
        F.lit(k_sigma * k_sigma).cast("decimal(3,0)")
        * (
            F.col("n").cast("decimal(12,0)") * F.col("ssq").cast("decimal(19,0)")
            - F.col("s").cast("decimal(19,0)") * F.col("s").cast("decimal(19,0)")
        )
    )
    return (
        base.join(F.broadcast(mom), "grp")
        .select(
            "grp", "n", "s",
            (lhs * lhs > rhs).cast("long").alias("is_out"),
        )
        .groupBy("grp")
        .agg(
            F.first("n").alias("n"),
            (F.first("s").cast("double") / F.first("n") / F.lit(float(scale))).alias("mean"),
            F.sum("is_out").cast("long").alias("n_outliers"),
        )
        .withColumnRenamed("grp", group_col)
    )


def sigma_outliers_oracle_sql(src: str, group_col: str, col: str,
                              k_sigma: int = 3, scale: int = 100) -> str:
    k2 = k_sigma * k_sigma
    return f"""
WITH base AS (
  SELECT {group_col} AS grp,
         CAST(round(CAST({col} AS DOUBLE) * {scale}) AS BIGINT) AS xl
  FROM {src}),
mom AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n, CAST(sum(xl) AS BIGINT) AS s,
         CAST(sum(xl * xl) AS BIGINT) AS ssq
  FROM base GROUP BY grp),
probe AS (
  SELECT b.grp, m.n, m.s,
         CASE WHEN CAST(m.n * b.xl - m.s AS DECIMAL(19,0))
                   * CAST(m.n * b.xl - m.s AS DECIMAL(19,0))
                 > CAST({k2} AS DECIMAL(3,0))
                   * (CAST(m.n AS DECIMAL(12,0)) * CAST(m.ssq AS DECIMAL(19,0))
                      - CAST(m.s AS DECIMAL(19,0)) * CAST(m.s AS DECIMAL(19,0)))
              THEN 1 ELSE 0 END AS is_out
  FROM base b JOIN mom m ON m.grp = b.grp)
SELECT grp AS {group_col}, CAST(any_value(n) AS BIGINT) AS n,
       CAST(any_value(s) AS DOUBLE) / any_value(n) / {float(scale)!r} AS mean,
       CAST(sum(is_out) AS BIGINT) AS n_outliers
FROM probe GROUP BY grp
"""


def ks_pairs(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic for EVERY unordered
    pair of groups — the distribution-shift detector of a training-data
    pipeline (has source X started producing different document lengths
    than source Y?).

    Exactness: at each observed value the ECDF gap is kept as the
    INTEGER |cum_a·n_b − cum_b·n_a| (cross-multiplied, so no float
    accumulates across rows); the statistic is max_gap / (n_a·n_b), one
    int-derived IEEE division at the end — bit-identical cross-engine.
    The default RANGE window frame evaluates each ECDF after all ties
    of a value, which is the textbook ECDF (right-continuous).

    Contract (ADVICE r7): ``value_col`` must be an INTEGRAL column
    (byte/short/int/long) — the exact-integer gap algebra is defined on
    the int64 value grid. A float/decimal column raises ``TypeError``
    instead of being silently floored by the long cast; callers with
    continuous values scale to a fixed-point grid first (e.g.
    ``F.round(col * 1000).cast("long")``) — KS is invariant under any
    strictly monotone transform, so a consistent grid preserves the
    statistic up to grid resolution.

    Plan shape (100 TB): group sizes are one hash aggregation; the
    pair relation is a deliberate cross of that p-row SIZES relation
    with itself (bounded by the number of groups, never by rows) and
    BROADCASTs into two equi-joins on the value stream (never an
    OR-condition nested loop); the scan per pair is a keyed
    window — partitions parallelize across pairs, the within-pair sort
    is the ECDF's inherent cost. For corpus-scale values switch to a
    binned ECDF (histogram KS) — same algebra over bin ids.
    """
    from pyspark.sql.window import Window

    vtype = df.schema[value_col].dataType.typeName()
    if vtype not in ("byte", "short", "integer", "long"):
        raise TypeError(
            f"ks_pairs: value_col {value_col!r} is {vtype}, not integral — "
            "scale continuous values to a fixed-point grid (e.g. "
            "round(col*1000).cast('long')) before calling"
        )
    vals = df.select(
        F.col(group_col).alias("_g"), F.col(value_col).cast("long").alias("_x")
    )
    sizes = vals.groupBy("_g").agg(F.count("*").cast("long").alias("_n"))
    pairs = F.broadcast(
        sizes.alias("a").join(sizes.alias("b"), F.col("a._g") < F.col("b._g"))
        .select(
            F.col("a._g").alias("s1"), F.col("b._g").alias("s2"),
            F.col("a._n").alias("na"), F.col("b._n").alias("nb"),
        )
    )
    ta = vals.join(pairs, F.col("_g") == F.col("s1")).select(
        "s1", "s2", "na", "nb", "_x",
        F.lit(1).alias("_ia"), F.lit(0).alias("_ib"),
    )
    tb = vals.join(pairs, F.col("_g") == F.col("s2")).select(
        "s1", "s2", "na", "nb", "_x",
        F.lit(0).alias("_ia"), F.lit(1).alias("_ib"),
    )
    w = Window.partitionBy("s1", "s2").orderBy("_x")
    gap = F.abs(
        F.sum("_ia").over(w) * F.col("nb") - F.sum("_ib").over(w) * F.col("na")
    )
    return (
        ta.unionByName(tb)
        .withColumn("_gap", gap)
        .groupBy("s1", "s2", "na", "nb")
        .agg(F.max("_gap").alias("_mg"))
        .select(
            "s1", "s2", "na", "nb",
            (F.col("_mg").cast("double")
             / (F.col("na").cast("double") * F.col("nb").cast("double")))
            .alias("ks"),
        )
    )


def ks_oracle_sql(src: str, group_col: str, value_col: str) -> str:
    """DuckDB twin of :func:`ks_pairs` — same integer gap algebra, same
    default RANGE frame, same final division tree."""
    return f"""
WITH v AS (SELECT {group_col} AS g, CAST({value_col} AS BIGINT) AS x FROM {src}),
g AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY g),
p AS (SELECT a.g AS s1, b.g AS s2, a.n AS na, b.n AS nb
      FROM g a JOIN g b ON a.g < b.g),
t AS (
  SELECT p.s1, p.s2, p.na, p.nb, v.x, 1 AS ia, 0 AS ib
  FROM v JOIN p ON v.g = p.s1
  UNION ALL
  SELECT p.s1, p.s2, p.na, p.nb, v.x, 0 AS ia, 1 AS ib
  FROM v JOIN p ON v.g = p.s2),
c AS (
  SELECT s1, s2, na, nb,
         abs(sum(ia) OVER w * nb - sum(ib) OVER w * na) AS gap
  FROM t WINDOW w AS (PARTITION BY s1, s2 ORDER BY x))
SELECT s1, s2, na, nb,
       CAST(max(gap) AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS ks
FROM c GROUP BY s1, s2, na, nb
"""


def weighted_median(df, group_cols: list[str], value_col: str,
                    weight_col: str):
    """Per-group weighted median: the smallest value whose cumulative
    weight reaches half the group's total (lower weighted median —
    2·cum >= total in integers, so no halving ever rounds). Weights
    must be integral (cast to long); values are only COMPARED, never
    operated on, so doubles pass through bit-exact.

    100 TB shape: one (group, value) aggregation collapses ties, one
    in-group window cumsum, one total join, one filter + min — all
    keyed on the group; no global sort, no per-group collect."""
    from pyspark.sql import Window

    g = [F.col(c) for c in group_cols]
    per_value = df.groupBy(*g, F.col(value_col).alias("_v")).agg(
        F.sum(F.col(weight_col).cast("long")).alias("_w"))
    w = (Window.partitionBy(*group_cols).orderBy("_v")
         .rowsBetween(Window.unboundedPreceding, 0))
    tot = Window.partitionBy(*group_cols)
    return (
        per_value
        .withColumn("_cum", F.sum("_w").over(w))
        .withColumn("_tot", F.sum("_w").over(tot))
        .filter(F.col("_cum") * 2 >= F.col("_tot"))
        .groupBy(*g)
        .agg(F.min("_v").alias("wmedian"))
    )


def percentile_rank(df, group_cols: list[str], value_col: str,
                    out_col: str = "pr_ppm"):
    """Per-group percentile rank as integer ppm: rows strictly smaller
    over (n-1), min-rank convention for ties, 0 for singleton groups —
    the rank-based feature normalization (quantile transform) that is
    robust to outliers where min-max scaling is not. Pure integer math
    (rank-1)*1e6 DIV (n-1): bit-portable, no division drift.

    100 TB shape: one window rank + one count over the same group
    partition — a single hash shuffle on the group key."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(value_col)
    tot = Window.partitionBy(*group_cols)
    return (
        df.withColumn("_rk", F.rank().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(tot))
        .withColumn(
            out_col,
            F.when(F.col("_n") > 1,
                   F.expr("CAST(((_rk - 1) * 1000000) DIV (_n - 1) AS BIGINT)"))
            .otherwise(F.lit(0).cast("long")),
        )
        .drop("_rk", "_n")
    )


def mad_outliers(df, group_cols: list[str], value_col: str, k: int = 3):
    """Robust per-group outliers by median absolute deviation: flag
    rows with |x − median| > k·MAD, both medians the exact LOWER
    median (2·cum ≥ total — deterministic, no interpolation; DuckDB's
    interpolating median() would drift, so oracles replay the same
    window construction). Medians/MAD are exact VALUE PICKS (no
    arithmetic); the deviation and threshold are two IEEE ops both
    engines evaluate identically — bit-portable without decimals.

    Complements the exact k-sigma outliers (sigma_outliers): MAD is
    what you use when the tail itself corrupts the variance. Three
    keyed shuffles (median, deviation median, flag join) — all on the
    group key."""
    from reactivedb_spark.operators.numeric import weighted_median

    one = df.withColumn("_one", F.lit(1))
    med = weighted_median(one, group_cols, value_col, "_one") \
        .withColumnRenamed("wmedian", "_med")
    dev = (
        df.join(med, group_cols)
        .withColumn("_dev", F.abs(F.col(value_col) - F.col("_med")))
    )
    mad = weighted_median(dev.withColumn("_one", F.lit(1)),
                          group_cols, "_dev", "_one") \
        .withColumnRenamed("wmedian", "_mad")
    return (
        dev.join(mad, group_cols)
        .filter(F.col("_dev") > F.lit(k) * F.col("_mad"))
        .drop("_dev", "_med", "_mad", "_one")
    )
