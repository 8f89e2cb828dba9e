"""Declared query suite: every implemented operator (SURVEY.md §2 +
training-data extensions) as a (Spark query, DuckDB oracle SQL) pair.

Contract (driver verify): each ``QUERIES[name](spark, sf_dir)`` returns a
DataFrame whose row count, schema, and order-insensitive value hash match
``ORACLES[name]`` run by DuckDB over the same parquet fixtures. Column
names/aliases are kept identical on both sides; engine-specific
nondeterminism (FP summation order, uuids, timestamps below µs) is
designed out — see the determinism notes in each module.
"""

from reactivedb_spark.suite import advanced, analytics, core, olap, pipeline, scale

# Registration order is part of the external contract: the driver's
# correctness gate checks the FIRST 50 registered queries. _WINDOW is the
# explicit round-8 rotation (VERDICT r7 "Next round" #1):
#   slot 1      — join_transform_diamond: the ONLY registered query with
#                 zero driver evidence (landed after the r7 window
#                 froze; builder-verified only until now).
#   slots 2-38  — the 37 queries whose newest green row is r5 (the
#                 stalest evidence in the pool), alphabetical.
#   slots 39-47 — the nine NEW/CHANGED round-8 queries (driver-
#                 unchecked by definition): bpe_train_batched (VERDICT
#                 #4: batched merge learning, merges=64 in 8 rounds),
#                 corpus_clean_cc (VERDICT #6: transitive-clustering
#                 near-dup removal), distinct_transform (extension
#                 transform #6: refcounted multi-column DISTINCT),
#                 kcore_parts (iterative-peel k-core decomposition),
#                 scd2_users (type-2 SCD history build), interval_join
#                 (banded two-sided interval overlap join), impute_docs
#                 (group-wise exact-mean/mode imputation),
#                 bigram_logprob (interpolated bigram LM scoring),
#                 ann_sq8_topk (SQ8 scalar-quantized ADC top-k).
#   slots 48-50 — three of the five single-green-r6 queries
#                 (dedup_containment_zipf, expr_functions,
#                 semantic_dedup). VERDICT #1 asked for 12 r6 slots;
#                 nine are given to new queries (it also demanded gates
#                 for #4/#6, and new queries always green-gate on first
#                 exposure) — the displaced nine (streaming_late_data,
#                 streaming_dedup_watermark [single-green],
#                 ann_knn_join, asof_forward, bloom_semi_join,
#                 bm25_topk, chunk_windows, cms_heavy_hitters,
#                 dag_chain) lead the r9 r6-block, the two
#                 single-greens first.
# Everything not in _WINDOW keeps its registration but lands in the tail
# (latest evidence r6/r7 — ≤2 rounds old at round 8); they rotate back in
# next round. tests/test_suite_registration.py enforces this layout.
_WINDOW = (
    # the one query with zero driver evidence, ever
    "join_transform_diamond",
    # r5-stale (newest green three rounds old by round 8's gate)
    "action_transform",
    "aggregation_transform",
    "ann_ivf_topk",
    "array_filter_dsl",
    "decontaminate",
    "dedup_clusters",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "delete_cascade",
    "events_hourly",
    "expr_arithmetic",
    "filter_transform",
    "find_one",
    "function_transform",
    "get_all",
    "graph_components_star",
    "greater_than",
    "less_than",
    "multimodal_embed",
    "multimodal_png_decode",
    "multimodal_wav_decode",
    "pack_budget",
    "pii_scrub",
    "sample_hash",
    "sample_stratified",
    "sessionize",
    "streaming_aggregate",
    "streaming_sessionize",
    "struct_map_project",
    "text_repetition",
    "tfidf_top_terms",
    "token_bpe",
    "top_bigrams",
    "union_transform",
    "zorder_scan",
    "zscore_outliers",
    # new round-8 queries (driver-unchecked by definition)
    "bpe_train_batched",  # new r8: 64 merges in 8 dominance-filtered rounds
    "corpus_clean_cc",  # new r8: transitive-clustering near-dup removal
    "distinct_transform",  # new r8: refcounted multi-column DISTINCT
    "kcore_parts",  # new r8: iterative-peel k-core decomposition
    "scd2_users",  # new r8: type-2 SCD history build
    "interval_join",  # new r8: banded two-sided interval overlap join
    "impute_docs",  # new r8: group-wise exact-mean/mode imputation
    "bigram_logprob",  # new r8: interpolated bigram LM scoring
    "ann_sq8_topk",  # new r8: SQ8 scalar-quantized ADC top-k
    # r6 single-green (streaming_late_data / streaming_dedup_watermark
    # displaced to the r9 head)
    "dedup_containment_zipf",
    "expr_functions",
    "semantic_dedup",
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
    q.update(advanced.QUERIES)
    o.update(advanced.ORACLES)
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
