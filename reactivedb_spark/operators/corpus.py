"""Corpus cleaning: the composed training-data pipeline.

One declarative flow over a documents table — the shape of a real
pretraining-data cleanup:

1. **quality gate** — heuristic score ≥ threshold (functions/text.py);
2. **language gate** — deterministic lang-ID prediction in an allowlist;
3. **exact dedup** — keep the min-id representative per normalized text;
4. **near-dup removal** — MinHash-LSH candidates → exact Jaccard verify;
   two policies (VERDICT r7 #6):

   - ``cluster=False`` (default): drop any doc whose Jaccard with a
     *smaller-id* doc exceeds the threshold ("keep first" — the
     standard linear-pass heuristic; under-merges chains a~b~c when
     a~c is below threshold);
   - ``cluster=True``: connected components over the verified pair
     graph (operators/graph.py min-label propagation), keep exactly
     the min-id doc per component — chains collapse transitively.

Every stage is a native DataFrame transform; the whole pipeline is one
lazy plan (Catalyst fuses the gates into the scans) plus the dedup
shuffles. The suite exposes it with a full SQL oracle — the composition
itself is oracle-checked, not just the pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from reactivedb_spark import cache
from reactivedb_spark.functions import text as textfns
from reactivedb_spark.operators import dedup


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    langs: tuple = ("en",),
    jaccard_threshold: float = 0.8,
    cluster: bool = False,
) -> DataFrame:
    """Returns the surviving documents (id + text + audit columns).
    ``cluster=True`` switches near-dup removal from keep-first to
    transitive connected-components (min-id per component survives)."""
    t = F.col(text_col)
    gated = (
        df.withColumn("quality", textfns.quality_score(t))
        .withColumn("pred_lang", textfns.lang_id(t))
        .filter((F.col("quality") >= min_quality) & F.col("pred_lang").isin(*langs))
    )
    # exact dedup: min-id representative per normalized text, as
    # groupBy(min) + join back. The r13 row_number-window variant (one
    # full-corpus exchange + SORT by the text hash, single consumer of
    # the quality/lang-ID projection) measured consistently SLOWER in a
    # calm-host interleaved A/B (r14: window 6.5-17.4 s vs join
    # 5.2-6.6 s min-of-5 at sf0.1, r12 shape ahead in all five rounds;
    # the driver's r13 bench read the same direction) — the groupBy
    # shuffles only (md5, id) pairs (narrow rows, map-side partial agg)
    # and the join-back re-shuffles the corpus WITHOUT sorting it,
    # which beats sorting the full text relation even though the gate
    # projection evaluates once per plan branch. Reverted per the
    # measure-and-revert discipline (guide §1.1).
    reps = (
        gated.groupBy(F.md5(dedup.normalize_text(t)).alias("_h"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    # survivors are read by three downstream consumers (token relation,
    # pair verify, final anti-join): persist once instead of re-running
    # the gates + dedup scan per consumer
    exact = cache.pin(gated.join(reps, id_col))
    # near-dup removal among survivors: drop the larger id of any pair
    # above the threshold. ONE token relation feeds minhash→LSH and the
    # Jaccard verify (min() is duplicate-insensitive, so the distinct
    # relation serves both stages).
    tok = cache.pin(dedup.tokens(exact, id_col, text_col, distinct=True))
    pairs = dedup.jaccard_pairs(
        exact, id_col, text_col, threshold=jaccard_threshold, tok=tok
    )
    if cluster:
        # transitive clustering: CC over the verified pair graph (the
        # localCheckpoint inside materializes the expensive LSH+verify
        # relation once); every non-min member of a component drops.
        # Star contraction (round 10, was the frontier variant): same
        # (node, min-id) labels, ~1.7-3x cheaper on dup graphs at both
        # measured decades and diameter-independent round count.
        from reactivedb_spark.operators.graph import connected_components_star

        comps = connected_components_star(pairs.select("doc_a", "doc_b"))
        losers = comps.filter(F.col("node") != F.col("cluster")).select(
            F.col("node").alias(id_col)
        )
    else:
        losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return exact.join(losers, id_col, "left_anti").select(
        id_col, text_col, "quality", "pred_lang"
    )
