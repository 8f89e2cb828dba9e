"""Corpus-trained n-gram language-model scoring — the LM-quality
signals of a training-data pipeline (Σ ln p per document; documents
whose LM score is an outlier are gibberish or boilerplate).

``bigram_logprob`` scores each document under a JELINEK-MERCER
interpolated bigram model trained on the corpus itself:

    p(w_i | w_{i-1}) = λ · c(w_{i-1} w_i)/c(w_{i-1}) + (1−λ) · c(w_i)/N

summed as ln-terms over every adjacent token pair. Interpolation (not
backoff) keeps every observed pair's probability a pure function of
three counts — no discounting schedule to replicate — and (1−λ)·p_uni
covers unseen contexts without special cases (every pair scored was
observed, so c(w_{i-1}) ≥ 1 always).

Determinism contract (the ``unigram_logprob`` recipe, extended):
- the ln ARGUMENT is computed with the same op order on both engines
  (two double divisions, one multiply each, one add — IEEE-identical
  given identical int inputs);
- ln() itself may differ by 1 ulp across libms, so each term is cast
  to DECIMAL(28,14) before the EXACT decimal sum; the final round(6)
  absorbs the pinned drift;
- adjacency is defined on the raw split-array positions (i−1, i) with
  both tokens non-empty — identical on both engines regardless of
  empty-token edge cases, and computed as a NARROW array transform
  (no positional self-join).

Plan shape (100 TB): three count aggregations (bigram, context,
unigram — all map-side combinable), each joined back to the per-doc
bigram stream keyed on its own n-gram (the vocabulary relations
shuffle-join above the broadcast gate, exactly like unigram_logprob's
size-gated vocabulary), one per-doc decimal sum. No windows, no
self-joins, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_LN_DEC = "decimal(28,14)"


def bigram_logprob(df: DataFrame, id_col: str, text_col: str,
                   lam: float = 0.75) -> DataFrame:
    """(id, n_bigrams, logprob): Σ ln(λ·p_bigram + (1−λ)·p_unigram)
    over the document's adjacent token pairs (lowercased, whitespace
    tokens). Documents with < 2 tokens carry no row (no pairs — the
    oracle's inner join drops them identically)."""
    arr = F.split(F.lower(F.trim(F.col(text_col))), " ")
    toks = df.select(F.col(id_col), F.explode(arr).alias("w"))
    pairs = (
        df.select(F.col(id_col), arr.alias("arr"))
        .select(id_col, F.explode(F.expr(
            "CASE WHEN size(arr) < 2 THEN"
            " array()::array<struct<w1 string, w2 string>>"
            " ELSE transform(sequence(1, size(arr) - 1),"
            " i -> struct(arr[i-1] AS w1, arr[i] AS w2)) END")).alias("pr"))
        .select(id_col, F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    uni = toks.filter(F.col("w") != "").groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("c_uni")
    )
    total = uni.agg(F.sum("c_uni").cast("long").alias("n_total"))
    big = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c_big")
    )
    ctx = pairs.groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("c_ctx")
    )
    # p = λ·(c_big/c_ctx) + (1−λ)·(c_uni/N): one op order, both engines
    lp = F.log(
        F.lit(float(lam)) * (F.col("c_big").cast("double")
                             / F.col("c_ctx").cast("double"))
        + F.lit(1.0 - float(lam)) * (F.col("c_uni").cast("double")
                                     / F.col("n_total").cast("double"))
    ).cast(_LN_DEC)
    scored = (
        pairs.join(big, ["w1", "w2"])
        .join(ctx, "w1")
        .join(uni.withColumnRenamed("w", "w2"), "w2")
        .crossJoin(F.broadcast(total))
        .select(id_col, lp.alias("lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.sum("lp").cast("double"), 6).alias("logprob"),
    )


def bigram_logprob_oracle_sql(src: str, id_col: str, text_col: str,
                              lam: float = 0.75) -> str:
    """DuckDB twin: identical adjacency, counts, op order and
    DECIMAL(28,14) ln pinning."""
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(string_split(lower(trim({text_col})), ' ')) AS w
  FROM {src}),
pairs AS (
  SELECT {id_col}, arr[i] AS w1, arr[i+1] AS w2
  FROM (SELECT {id_col}, string_split(lower(trim({text_col})), ' ') AS arr,
               unnest(range(1, len(string_split(lower(trim({text_col})), ' ')))) AS i
        FROM {src})
  WHERE arr[i] <> '' AND arr[i+1] <> ''),
uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c_uni
        FROM toks WHERE w <> '' GROUP BY w),
tot AS (SELECT CAST(sum(c_uni) AS BIGINT) AS n_total FROM uni),
big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_big
        FROM pairs GROUP BY w1, w2),
ctx AS (SELECT w1, CAST(count(*) AS BIGINT) AS c_ctx
        FROM pairs GROUP BY w1),
terms AS (
  SELECT p.{id_col},
         CAST(ln({float(lam)!r} * (CAST(c_big AS DOUBLE) / CAST(c_ctx AS DOUBLE))
                 + {float(1.0 - lam)!r} * (CAST(c_uni AS DOUBLE)
                                           / CAST(n_total AS DOUBLE)))
              AS DECIMAL(28,14)) AS lp
  FROM pairs p
  JOIN big USING (w1, w2)
  JOIN ctx USING (w1)
  JOIN uni ON uni.w = p.w2
  CROSS JOIN tot)
SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(CAST(sum(lp) AS DOUBLE), 6) AS logprob
FROM terms GROUP BY {id_col}
"""
