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
# explicit round-6 rotation (VERDICT r5 "Next round" #1):
#   slots 1-16  — the 16 queries whose newest green row is r3 (the
#                 stalest evidence in the pool — includes the whole
#                 heavy word-level dedup family, which must be
#                 re-verified under the round-5 64-bit SimHash +
#                 stop-band-guard code),
#   slots 17-21 — new round-6 queries (driver-unchecked by definition),
#   slots 22-50 — the single-green round-4 set, fewest-greens-first
#                 with alphabetical tie-break (29 of 39 fit; the 10
#                 remaining single-green r4 rows — source_orc,
#                 source_partitioned,
#                 streaming_dedup, streaming_sliding,
#                 streaming_stateful_totals, streaming_stream_join,
#                 streaming_tumbling, table_profile, unigram_logprob,
#                 winsorize_prices — lead the next rotation).
# Everything not in _WINDOW keeps its registration but lands in the tail
# (latest evidence r4/r5 — ≤2 rounds old at round 6); they rotate back in
# next round. tests/test_suite_registration.py enforces this layout.
_WINDOW = (
    # r3-stale (newest green two rounds old)
    "ann_buckets",
    "corpus_clean",
    "dedup_jaccard",
    "dedup_lsh_candidates",
    "dedup_minhash",
    "dedup_simhash",
    "embedding_near_dups",
    "fingerprint",
    "lang_id",
    "multimodal_decode",
    "multimodal_frames",
    "similarity_topk",
    "text_quality",
    "token_count",
    "topk_orders",
    "window_rank",
    # round-6 additions (driver-unchecked by definition)
    "dedup_containment_zipf",  # new r6: Zipfian-corpus prefix-filter join
    "streaming_late_data",  # new r6: watermark late-data dropping
    "streaming_dedup_watermark",  # new r6: bounded-state streaming dedup
    "expr_functions",  # new r6: DSL scalar-function library
    "semantic_dedup",  # new r6: SemDeDup embedding near-dup removal
    # single-green r4 set, alphabetical (29 of 39 fit)
    "ann_knn_join",
    "asof_forward",
    "bloom_semi_join",
    "bm25_topk",
    "chunk_windows",
    "cms_heavy_hitters",
    "dag_chain",
    "dedup_transform",
    "duplicate_spans",
    "embedding_clusters",
    "event_deltas",
    "events_json",
    "grouping_sets",
    "hll_users",
    "multimodal_pixel_features",
    "multimodal_resize",
    "pagerank_orders",
    "pq_topk",
    "price_deciles",
    "price_histogram",
    "range_join_attrib",
    "resample_gapfill",
    "retention_weeks",
    "rolling_avg",
    "sample_transform",
    "sample_weighted",
    "skew_salted_agg",
    "source_csv",
    "source_jsonl",
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
