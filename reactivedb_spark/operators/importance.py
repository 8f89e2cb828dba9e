"""DSIR-style data selection with importance resampling (Xie et al.,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023) — the hashed-n-gram importance weighting a training-data
pipeline uses to tilt a raw corpus toward a curated target domain.

Model: unigram bag-of-hashed-features. Every token hashes into one of
``n_buckets`` feature buckets (portable md5→int64, the sampling.py
convention); the target subset and the full corpus each define a
Laplace-smoothed multinomial over buckets, and a document's log
importance weight is

    log w(d) = Σ_b  cnt_d[b] · ln( p_target[b] / p_source[b] )

Documents with log w > 0 look more like the target than the average
source document; resampling by these weights (e.g. the top fraction,
or a Gumbel draw) yields the DSIR-selected corpus. This module emits
the per-document weights — the selection policy composes downstream
(operators/sampling.py already provides deterministic weighted draws).

Determinism contract (the lm.py recipe):
- bucket id is a pure function of the token via the portable md5 hash
  (identical in DuckDB: ('0x' || substr(md5(w),1,15))::BIGINT % B);
- the ln ARGUMENT is computed with one fixed op order on both engines
  — two double divisions and one double division of the ratios
  ((c_t+1)/(N_t+B)) / ((c_s+1)/(N_s+B)) — IEEE-identical given
  identical integer counts;
- ln() may differ by 1 ulp across libms, so each bucket's ln is pinned
  to DECIMAL(28,14) BEFORE the per-document multiply-sum; the
  per-bucket count multiplies in as DECIMAL(9,0) — the widest integer
  precision whose product with the pinned ln stays inside
  DECIMAL(38,14) (9+28+1 = 38) with no scale loss — exact in both
  engines; the final round(6) absorbs the pinned drift. Past the
  10⁹-tokens-per-bucket bound BOTH engines fail loudly: DuckDB's cast
  errors on overflow, and the Spark side guards the cast with
  raise_error (ADVICE r9 — Spark non-ANSI would otherwise null the
  cast and F.sum would silently skip the term).

Plan shape (100 TB): one explode+groupBy for per-doc bucket counts
(map-side combinable), TWO global bucket aggregations whose results
are ``n_buckets`` rows — broadcast by construction — joined into the
per-doc stream, one keyed decimal sum. No windows, no self-joins, no
driver materialization; the bucket-stats relation stays a few KB no
matter the corpus size (that is the point of feature hashing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from reactivedb_spark.operators.sampling import _hash64

_LN_DEC = "decimal(28,14)"


def dsir_log_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    n_buckets: int = 1024,
) -> DataFrame:
    """(id, n_tokens, log_w): hashed-unigram DSIR log importance weight
    of every document toward the ``target`` subset (a boolean Column
    over ``df``'s rows). Empty documents carry no row (no tokens — the
    oracle's joins drop them identically)."""
    b = int(n_buckets)
    toks = (
        df.select(F.col(id_col), target.alias("_t"),
                  F.explode(F.split(F.lower(F.trim(F.col(text_col))), " "))
                  .alias("w"))
        .filter(F.col("w") != "")
        .select(id_col, "_t", (_hash64(F.col("w")) % b).alias("bkt"))
    )
    # five consumers (per-doc counts, source/target bucket counts, two
    # totals) would each re-explode + re-hash the corpus; pin the token
    # stream once (scoped release via cache.cache_scope)
    from reactivedb_spark import cache as _cache

    toks = _cache.pin(toks)
    doc_cnt = toks.groupBy(id_col, "bkt").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"))
    src = toks.groupBy("bkt").agg(
        F.count(F.lit(1)).cast("long").alias("c_s"))
    tgt = toks.filter(F.col("_t")).groupBy("bkt").agg(
        F.count(F.lit(1)).cast("long").alias("c_t"))
    # totals fold from the ≤n_buckets-row relations, not the token
    # stream — two data-sized cache scans replaced by 1024-row sums;
    # coalesce keeps an EMPTY target subset at N_t = 0 (sum of no rows
    # is NULL, count was 0 — the oracle's count(*) semantics)
    n_src = src.agg(
        F.coalesce(F.sum("c_s"), F.lit(0)).cast("long").alias("n_s"))
    n_tgt = tgt.agg(
        F.coalesce(F.sum("c_t"), F.lit(0)).cast("long").alias("n_t"))
    stats = (
        src.join(tgt, "bkt", "left")
        .select("bkt", "c_s", F.coalesce("c_t", F.lit(0)).alias("c_t"))
        .crossJoin(F.broadcast(n_src)).crossJoin(F.broadcast(n_tgt))
    )
    # fixed op order: (c_t+1)/(N_t+B), (c_s+1)/(N_s+B), then one divide
    ln_ratio = F.log(
        ((F.col("c_t") + F.lit(1)).cast("double")
         / (F.col("n_t") + F.lit(b)).cast("double"))
        / ((F.col("c_s") + F.lit(1)).cast("double")
           / (F.col("n_s") + F.lit(b)).cast("double"))
    ).cast(_LN_DEC)
    terms = (
        doc_cnt.join(F.broadcast(stats.select("bkt", ln_ratio.alias("lnr"))),
                     "bkt")
        .select(id_col, "cnt",
                (F.when(F.col("cnt") < F.lit(1_000_000_000),
                        F.col("cnt").cast("decimal(9,0)"))
                 .otherwise(F.raise_error(F.lit(
                     "dsir: per-doc bucket count exceeds the "
                     "DECIMAL(9,0) contract bound")).cast("decimal(9,0)"))
                 * F.col("lnr"))
                .alias("term"))
    )
    return terms.groupBy(id_col).agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.round(F.sum("term").cast("double"), 6).alias("log_w"),
    )


def dsir_oracle_sql(src: str, id_col: str, text_col: str,
                    target_sql: str, n_buckets: int = 1024) -> str:
    """DuckDB twin: identical md5 bucketing, Laplace counts, op order
    and DECIMAL(28,14) ln pinning. ``target_sql`` is the boolean SQL
    expression naming the target subset."""
    b = int(n_buckets)
    return f"""
WITH toks AS (
  SELECT {id_col}, t,
         CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % {b} AS bkt
  FROM (SELECT {id_col}, ({target_sql}) AS t,
               unnest(string_split(lower(trim({text_col})), ' ')) AS w
        FROM {src})
  WHERE w <> ''),
doc_cnt AS (SELECT {id_col}, bkt, CAST(count(*) AS BIGINT) AS cnt
            FROM toks GROUP BY {id_col}, bkt),
srcb AS (SELECT bkt, CAST(count(*) AS BIGINT) AS c_s FROM toks GROUP BY bkt),
tgtb AS (SELECT bkt, CAST(count(*) AS BIGINT) AS c_t FROM toks
         WHERE t GROUP BY bkt),
ns AS (SELECT CAST(count(*) AS BIGINT) AS n_s FROM toks),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n_t FROM toks WHERE t),
stats AS (
  SELECT srcb.bkt,
         CAST(ln((CAST(coalesce(c_t, 0) + 1 AS DOUBLE)
                  / CAST(n_t + {b} AS DOUBLE))
                 / (CAST(c_s + 1 AS DOUBLE)
                    / CAST(n_s + {b} AS DOUBLE)))
              AS DECIMAL(28,14)) AS lnr
  FROM srcb LEFT JOIN tgtb ON srcb.bkt = tgtb.bkt
  CROSS JOIN ns CROSS JOIN nt)
SELECT d.{id_col}, CAST(sum(cnt) AS BIGINT) AS n_tokens,
       round(CAST(sum(CAST(cnt AS DECIMAL(9,0)) * lnr) AS DOUBLE), 6)
         AS log_w
FROM doc_cnt d JOIN stats ON d.bkt = stats.bkt
GROUP BY d.{id_col}
"""


def dsir_resample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    budget: int,
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR selection (Xie et al. 2023 §3): Gumbel-top-k resampling of
    the corpus by the computed importance weights into a ``budget`` of
    documents — the step that actually consumes ``dsir_log_weights``
    in a training-data pipeline. Sampling WITHOUT replacement with
    probability ∝ w(d) is exactly taking the top-k of
    log w(d) + Gumbel(0,1); the Gumbel draw is −ln(−ln(u)) with the
    portable md5 uniform u = h/2⁶⁰ (sampling.py convention), so the
    draw replays identically in the oracle.

    Determinism contract (tightened per ADVICE r10): the Gumbel term
    −ln(−ln(u)) is the only unpinned libm surface (JVM Math.log vs
    DuckDB libm can differ by 1 ulp), so it is pinned by round(·, 6)
    BY ITSELF before the add — the key is then one IEEE double add of
    two already-6-decimal-pinned doubles (``log_w`` ships pre-pinned),
    followed by an outer round(·, 6) that sees bit-identical inputs on
    both engines. u is clamped to ≥ 2⁻⁶⁰ so the h==0 row (prob 2⁻⁶⁰)
    yields a finite draw instead of Spark-NULL/DuckDB-error. (A
    DECIMAL(28,14) cast is NOT portable here: DuckDB converts
    double→decimal by multiply-then-round in double, which disagrees
    with Spark's exact BigDecimal conversion in the 14th digit —
    measured on this very key.) Declared residual tolerance: a raw
    Gumbel draw within 1 ulp of a 0.5e-6 rounding boundary can still
    flip the 6th decimal between engines (probability ≈ 2⁻⁴⁴ per row);
    keys tying at 6 decimals break by id.

    Plan shape (100 TB): the weight stage is dsir_log_weights
    (broadcast bucket stats, one token shuffle); the selection is a
    per-partition top-k merged on the driver's single reduce
    (TakeOrderedAndProject) — no global sort, no extra shuffle.
    """
    u = F.greatest(
        _hash64(F.col(id_col)).cast("double") / F.lit(float(1 << 60)),
        F.lit(2.0 ** -60),
    )
    gumbel = F.round(-F.log(-F.log(u)), 6)
    key = F.round(F.col("log_w") + gumbel, 6)
    w = dsir_log_weights(df, id_col, text_col, target, n_buckets)
    return (
        w.select(id_col, "n_tokens", "log_w", key.alias("sel_key"))
        .orderBy(F.desc("sel_key"), id_col)
        .limit(int(budget))
    )


def dsir_resample_oracle_sql(src: str, id_col: str, text_col: str,
                             target_sql: str, budget: int,
                             n_buckets: int = 1024) -> str:
    """DuckDB twin of ``dsir_resample``: the weight query as a derived
    table, the identical md5 uniform / pinned Gumbel key, top-k by
    (key DESC, id)."""
    inner = dsir_oracle_sql(src, id_col, text_col, target_sql, n_buckets)
    return f"""
SELECT {id_col}, n_tokens, log_w,
       round(log_w + round(-ln(-ln(greatest(
           CAST(('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 15))
                AS BIGINT) / CAST(1152921504606846976 AS DOUBLE),
           8.673617379884035e-19))), 6), 6)
         AS sel_key
FROM ({inner}) w
ORDER BY sel_key DESC, {id_col} LIMIT {int(budget)}
"""
