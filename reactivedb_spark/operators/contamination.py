"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation/benchmark set.

The standard pre-training hygiene step: any document sharing an n-gram
of meaningful length with the eval set is flagged (and usually dropped)
so benchmark questions never leak into training data. Expressed as one
explode + one semi-join + one aggregation:

- corpus side: explode each document's token n-grams (pure column
  exprs — ``split``/``sequence``/``slice``/``concat_ws``, no Python),
- bench side: the DISTINCT n-gram set of the eval corpus. Eval sets are
  tiny next to a 100 TB corpus (thousands of docs vs billions), so this
  side is explicitly ``broadcast`` — the semi-join then runs map-side
  with NO shuffle of the exploded corpus relation,
- per-doc hit counts: ``count(distinct ng)`` grouped by doc id — the
  only shuffle in the plan, keyed on doc id (uniform), carrying only
  the matched rows (contamination is rare, so this relation is near
  empty).

Per-doc total n-gram counts come from ``size(array_distinct(...))`` —
a narrow map, no shuffle. Everything is exact integer math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def ngrams_expr(text_col: Column, n: int) -> Column:
    """Array of space-joined token ``n``-grams of a whitespace-tokenized
    text column (empty array when the doc has fewer than ``n`` tokens —
    guarded because ``sequence(1, 0)`` would count DOWN, not empty)."""
    l = F.filter(F.split(text_col, " "), lambda x: x != "")
    idx = F.sequence(F.lit(1), F.size(l) - (n - 1))
    return F.when(
        F.size(l) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(l, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def ngram_overlap(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """(id, n_ngrams, n_hits, contaminated): how many of each corpus
    document's distinct ``n``-grams appear anywhere in ``bench``.

    ``contaminated`` is 1 when any n-gram overlaps — the drop signal of
    a decontamination pass (filter on it, or join back to drop)."""
    ngs = ngrams_expr(F.col(text_col), n)
    bench_ng = bench.select(F.explode(ngs).alias("ng")).distinct()
    doc_ng = corpus.select(F.col(id_col), F.explode(ngs).alias("ng"))
    hits = (
        doc_ng.join(F.broadcast(bench_ng), "ng", "left_semi")
        .groupBy(id_col)
        .agg(F.count_distinct("ng").alias("n_hits"))
    )
    base = corpus.select(
        F.col(id_col),
        F.size(F.array_distinct(ngs)).cast("long").alias("n_ngrams"),
    )
    return base.join(hits, id_col, "left").select(
        F.col(id_col),
        "n_ngrams",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).cast("int").alias("contaminated"),
    )
