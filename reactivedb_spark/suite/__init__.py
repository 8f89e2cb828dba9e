"""Declared query suite: every implemented operator (SURVEY.md §2 +
training-data extensions) as a (Spark query, DuckDB oracle SQL) pair.

Contract (driver verify): each ``QUERIES[name](spark, sf_dir)`` returns a
DataFrame whose row count, schema, and order-insensitive value hash match
``ORACLES[name]`` run by DuckDB over the same parquet fixtures. Column
names/aliases are kept identical on both sides; engine-specific
nondeterminism (FP summation order, uuids, timestamps below µs) is
designed out — see the determinism notes in each module.
"""

from reactivedb_spark.suite import analytics, core, olap, pipeline, scale

# Registration order is part of the external contract: the driver's
# correctness gate checks the FIRST 50 registered queries. _WINDOW is the
# explicit round-5 rotation (VERDICT r4 "Next round" #1):
#   slots 1-12  — the 12 queries that have NEVER had a driver row
#                 (round-4 late additions, pipeline tail),
#   slot 13+    — new round-5 queries (driver-unchecked by definition),
#   then the stalest driver-green rows, fewest-greens-first:
#                 sessionize (green r2 only), the single-green r3 set,
#                 the double-green r3 set, and as many of the
#                 triple-green §2 core verbs as fit.
# Everything not in _WINDOW keeps its registration but lands in the tail
# (latest evidence r3/r4 — ≤2 rounds old at round 5); they rotate back in
# next round. tests/test_suite_registration.py enforces this layout.
_WINDOW = (
    # never driver-checked (round-4 tail)
    "zscore_outliers",
    "span_dedup_rewrite",
    "chunk_transform",
    "zorder_scan",
    "full_outer_join",
    "textstats_transform",
    "pq_rerank",
    "bucketed_join",
    "funnel_stages",
    "source_schema_evolution",
    "store_time_travel",
    "dedup_containment",
    # round-5 additions / semantics changes (driver-unchecked by definition)
    "multimodal_jpeg_decode",
    "dedup_simhash_pairs",  # re-verify: 64-bit split-signature layout (r5)
    "dedup_jaccard_guarded",  # new r5: stop-band guard semantics
    "dedup_containment_exact",  # new r5: full-recall prefix-filter join
    # stalest greens: r2-only
    "sessionize",
    # r3-only single-green
    "array_filter_dsl",
    "struct_map_project",
    "streaming_sessionize",
    "text_repetition",
    "tfidf_top_terms",
    "top_bigrams",
    "pack_budget",
    "decontaminate",
    "pii_scrub",
    "sample_hash",
    "sample_stratified",
    "graph_components_star",
    "multimodal_png_decode",
    "multimodal_wav_decode",
    # r3 double-green (r2+r3)
    "aggregation_transform",
    "streaming_aggregate",
    "ann_ivf_topk",
    "events_hourly",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "token_bpe",
    "multimodal_embed",
    # r3 triple-green §2 core verbs + headline families (as many as fit)
    "function_transform",
    "filter_transform",
    "union_transform",
    "find_one",
    "get_all",
    "less_than",
    "greater_than",
    "delete_cascade",
    "action_transform",
    "expr_arithmetic",
    "dedup_exact",
)
assert len(_WINDOW) == 50


def _pool():
    q = {}
    q.update(core.QUERIES)
    q.update(pipeline.QUERIES)
    q.update(pipeline.QUERIES_TAIL)
    q.update(analytics.QUERIES)
    q.update(olap.QUERIES)
    q.update(scale.QUERIES)
    o = {}
    o.update(core.ORACLES)
    o.update(pipeline.ORACLES)
    o.update(pipeline.ORACLES_TAIL)
    o.update(analytics.ORACLES)
    o.update(olap.ORACLES)
    o.update(scale.ORACLES)
    return q, o


def all_queries():
    pool, _ = _pool()
    q = {name: pool[name] for name in _WINDOW}
    for name, fn in pool.items():
        q.setdefault(name, fn)
    return q


def all_oracles():
    pool_q, pool_o = _pool()
    o = {name: pool_o[name] for name in _WINDOW if name in pool_o}
    for name, sql in pool_o.items():
        o.setdefault(name, sql)
    return o
