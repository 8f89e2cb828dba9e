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
# explicit round-9 rotation, exactly as prescribed by VERDICT r8 "Next
# round" #1:
#   slots 1-34  — the 34 round-8 tail queries with ZERO driver evidence
#                 (they landed after the r8 window froze), alphabetical.
#                 Green-gating all of them restores the invariant that
#                 no registered query lacks driver evidence.
#   slots 35-50 — sixteen r6-stale queries, fewest-greens-first: the
#                 r8-displaced nine (streaming_late_data,
#                 streaming_dedup_watermark [single-green], ann_knn_join,
#                 asof_forward, bloom_semi_join, bm25_topk, chunk_windows,
#                 cms_heavy_hitters, dag_chain), then source_csv,
#                 source_jsonl, pagerank_orders, dedup_lsh_candidates,
#                 dedup_jaccard, corpus_clean, dedup_minhash.
# Everything not in _WINDOW keeps its registration but lands in the tail;
# tests/test_suite_registration.py enforces this layout.
#
# ROUND-10 ROTATION PLAN (VERDICT r8 #5 — committed now so the window
# discipline survives judge turnover). After r9's gate, the r6-stale
# backlog is the 31 queries below (the 47 r6-greens minus r9's 16);
# newest green for everything else is r7+ (≤3 rounds old at r10):
#   slots 1..k  — any query registered during round 9 with no driver
#                 evidence yet (as of the r9 window freeze:
#                 listen_cascade_events — VERDICT r8 #7, dsir_weights,
#                 length_buckets), first, alphabetical.
#   next 31     — the full remaining r6-stale block, alphabetical:
#                 ann_buckets, dedup_simhash, dedup_transform,
#                 duplicate_spans, embedding_clusters,
#                 embedding_near_dups, event_deltas, events_json,
#                 fingerprint, grouping_sets, hll_users, lang_id,
#                 multimodal_decode, multimodal_frames,
#                 multimodal_pixel_features, multimodal_resize, pq_topk,
#                 price_deciles, price_histogram, range_join_attrib,
#                 resample_gapfill, retention_weeks, rolling_avg,
#                 sample_transform, sample_weighted, similarity_topk,
#                 skew_salted_agg, text_quality, token_count,
#                 topk_orders, window_rank.
#                 This clears ALL r6 staleness: after r10 no query's
#                 newest green is older than r7.
#   remainder   — oldest-first from the r7-green block (alphabetical
#                 within equal staleness) until the 50 slots are full.
# r11+ continues the same rule: new/never-gated first, then strictly
# fewest-greens/stalest-first — every query re-greens at most 3 rounds
# after its last gate.
_WINDOW = (
    # slots 1-34: the round-8 tail — zero driver evidence, alphabetical
    "assoc_rules",
    "bfs_hops",
    "burst_detection",
    "cumulative_distinct",
    "decile_lift",
    "dq_audit",
    "event_transitions",
    "fk_discovery",
    "funnel_latency",
    "fuzzy_join_edit",
    "fuzzy_join_guarded",
    "gini_spend",
    "interpolate_gapfill",
    "kfold_split",
    "label_prop_comms",
    "mad_outliers",
    "merge_upsert",
    "multimodal_dhash",
    "ohlc_hourly",
    "pareto_front",
    "percentile_rank",
    "record_linkage",
    "rolling_wau",
    "rollup_cascade",
    "session_paths",
    "skipgram_pairs",
    "snapshot_diff_accounts",
    "streaming_merge_upsert",
    "streaming_windowed_distinct",
    "table_checksums",
    "time_weighted_balance",
    "trigram_search",
    "vocab_coverage",
    "weighted_median_price",
    # slots 35-50: sixteen r6-stale, fewest-greens-first (VERDICT order)
    "streaming_late_data",
    "streaming_dedup_watermark",
    "ann_knn_join",
    "asof_forward",
    "bloom_semi_join",
    "bm25_topk",
    "chunk_windows",
    "cms_heavy_hitters",
    "dag_chain",
    "source_csv",
    "source_jsonl",
    "pagerank_orders",
    "dedup_lsh_candidates",
    "dedup_jaccard",
    "corpus_clean",
    "dedup_minhash",
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
