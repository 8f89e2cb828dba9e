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
# explicit round-7 rotation (VERDICT r6 "Next round" #1):
#   slots 1-21  — the 21 queries whose newest green row is r4 (the
#                 stalest evidence in the pool). streaming_dedup leads:
#                 it switched to the RocksDB state-store provider AFTER
#                 its last green row, so its rotation green doubles as
#                 the provider-invariance proof. The rest alphabetical.
#   slots 22-37 — the sixteen NEW round-7 queries (driver-unchecked
#                 by definition): streaming_outer_join,
#                 wav_frame_features, triangle_count, char_entropy,
#                 bpe_train, streaming_timeout_sessions, join_transform,
#                 phrase_search, ngram_novelty, regression_by_group,
#                 stream_static_enrich, topk_transform, kmeans_iterate,
#                 ks_drift, corr_matrix, bpe_encode.
#   slots 38-50 — 13 of the 15 queries whose only green row is r5
#                 (fewest-greens-first), alphabetical; the displaced
#                 tail (zorder_scan, zscore_outliers [single-green r5],
#                 array_filter_dsl, decontaminate,
#                 graph_components_star, multimodal_png_decode,
#                 multimodal_wav_decode, pack_budget, pii_scrub,
#                 sample_hash, sample_stratified, streaming_sessionize,
#                 struct_map_project, text_repetition, tfidf_top_terms,
#                 top_bigrams — all newest-green r5) leads the next
#                 rotation.
# Everything not in _WINDOW keeps its registration but lands in the tail
# (latest evidence r5/r6 — ≤2 rounds old at round 7); they rotate back in
# next round. tests/test_suite_registration.py enforces this layout.
_WINDOW = (
    # r4-stale (newest green three rounds old by round 7's gate)
    "streaming_dedup",  # provider-invariance proof: RocksDB adopted post-green
    "anti_join",
    "asof_join",
    "cube_orders",
    "distinct_agg",
    "median_price",
    "pivot_priority",
    "revenue_by_nation",
    "rollup_orders",
    "semi_join",
    "set_ops",
    "source_orc",
    "source_partitioned",
    "streaming_sliding",
    "streaming_stateful_totals",
    "streaming_stream_join",
    "streaming_tumbling",
    "table_profile",
    "tpch_q1_like",
    "unigram_logprob",
    "winsorize_prices",
    # new round-7 queries (driver-unchecked by definition)
    "streaming_outer_join",  # new r7: watermark-driven null emission
    "wav_frame_features",  # new r7: windowed audio features over real WAV
    "triangle_count",  # new r7: degree-oriented exact triangle counting
    "char_entropy",  # new r7: per-doc Shannon entropy quality signal
    "bpe_train",  # new r7: distributed BPE merge learning
    "streaming_timeout_sessions",  # new r7: event-time-timer custom operator
    "join_transform",  # new r7: incrementally maintained inner equi-join
    "phrase_search",  # new r7: positional-index exact phrase query
    "ngram_novelty",  # new r7: per-doc first-seen 8-gram fraction
    "regression_by_group",  # new r7: exact-sum OLS as one aggregation
    "stream_static_enrich",  # new r7: stateless stream-static dim join
    "topk_transform",  # new r7: incrementally maintained per-group top-k
    "kmeans_iterate",  # new r7: grid-quantized Lloyd's, exact unrolled oracle
    "ks_drift",  # new r7: exact two-sample KS over source pairs
    "corr_matrix",  # new r7: one-pass exact-sum Pearson matrix
    "bpe_encode",  # new r7: train-then-apply BPE tokenization
    # single-green r5 set, alphabetical (all 15)
    "bucketed_join",
    "chunk_transform",
    "dedup_containment",
    "dedup_containment_exact",
    "dedup_jaccard_guarded",
    "full_outer_join",
    "funnel_stages",
    "multimodal_jpeg_decode",
    "pq_rerank",
    "source_schema_evolution",
    "span_dedup_rewrite",
    "store_time_travel",
    "textstats_transform",
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
