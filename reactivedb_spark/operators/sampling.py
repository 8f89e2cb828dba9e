"""Deterministic sampling operators for training-data pipelines.

Repeatable corpus sampling can't use ``rand()`` (nondeterministic across
retries/engines and unusable for an oracle): both operators key off md5
of the row id — the same portable hash trick the dedup family uses —
so every engine (and every re-run at any parallelism) selects the same
rows. Both are single-pass: a hash-filter is a narrow map (pushes to the
scan, no shuffle); per-stratum top-k is one keyed window shuffle, the
same economics as any groupBy at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _hash64(col) -> F.Column:
    """Portable md5→int64: first 15 hex chars (60 bits, positive).
    Identical in DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def hash_sample(df: DataFrame, id_col: str, rate_pct: int) -> DataFrame:
    """Keep ~rate_pct% of rows: md5(id) mod 100 < rate_pct. A narrow
    filter — deterministic, repartition-proof, joins consistently with
    any other table sampled on the same key."""
    return df.filter(_hash64(F.col(id_col)) % 100 < rate_pct)


def stratified_sample(df: DataFrame, id_col: str, stratum_col: str,
                      n_per_stratum: int) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen by hash order — a deterministic equal-allocation
    stratified sample (the class-balancing step of a training-mix
    pipeline). One window shuffle on the stratum key; hash order makes
    the pick uniform-ish while (hash, id) ordering pins ties."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(stratum_col).orderBy(
        _hash64(F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def weighted_sample(df: DataFrame, id_col: str, weight_col: str,
                    rate: float) -> DataFrame:
    """Weighted Bernoulli (probability-proportional-to-size) sample:
    each row is kept independently with probability
    ``min(1, rate × weight)`` — the importance-sampling step of a
    training-mix pipeline (oversample high-quality/high-value rows at a
    controlled budget; E[sample] = rate × Σ min-capped weights).

    Deterministic: the uniform draw is md5(id) → 60-bit integer / 2⁶⁰,
    so every engine and re-run keeps the same rows; the comparison uses
    only IEEE multiply/divide/compare (no libm), so the pick is
    bit-identical cross-engine — unlike exp/pow-based reservoir
    priorities (Efraimidis–Spirakis), whose libm rounding may diverge
    by 1 ulp between engines. A narrow filter: pushes to the scan, no
    shuffle, repartition-proof."""
    u = _hash64(F.col(id_col)).cast("double") / F.lit(float(1 << 60))
    return df.filter(u < F.lit(rate) * F.col(weight_col).cast("double"))


def kfold_split(df, stratum_cols: list[str], id_col: str, k: int = 5,
                out_col: str = "fold"):
    """Stratified k-fold assignment: within each stratum, rows are
    ranked by the portable md5 draw (ties by id) and fold = rank mod k
    — every stratum splits into folds whose sizes differ by at most
    one (EXACT stratification, unlike hash-mod-k which only balances
    in expectation), and the assignment is deterministic across
    engines/retries so train/eval splits never drift between runs.

    One window rank per stratum — a single hash shuffle on the stratum
    key at any scale."""
    from pyspark.sql import Window

    w = Window.partitionBy(*stratum_cols).orderBy(
        _hash64(F.col(id_col)), F.col(id_col))
    return df.withColumn(
        out_col,
        ((F.row_number().over(w) - 1) % k).cast("long"),
    )
