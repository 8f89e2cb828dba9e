"""Registration-order contract: the driver's correctness gate checks the
FIRST 50 registered queries. Round-11 rotation (the plan committed in
round 10, executed verbatim — VERDICT r10 #1): slots 1-4 are the round-10
additions that have NEVER been driver-gated (alphabetical — the last §2
behaviors without driver evidence); slots 5-38 are the full remaining
r7-green block (34 queries, alphabetical) — after this gate no query's
newest green is older than r8; slots 39-50 are the first twelve
r8-greens, alphabetical. Everything else fills the tail and rotates per
the ROUND-12 plan written in suite/__init__.py."""

from reactivedb_spark import suite

NEVER_GATED_R10_QUARTET = [
    "dsir_resample",
    "insert_report",
    "listen_fanout",
    "txn_rollback",
]

R7_STALE_THIRTYFOUR = [
    "kmeans_iterate",
    "ks_drift",
    "median_price",
    "multimodal_jpeg_decode",
    "ngram_novelty",
    "phrase_search",
    "pivot_priority",
    "pq_rerank",
    "regression_by_group",
    "revenue_by_nation",
    "rollup_orders",
    "semi_join",
    "set_ops",
    "source_orc",
    "source_partitioned",
    "source_schema_evolution",
    "span_dedup_rewrite",
    "store_time_travel",
    "stream_static_enrich",
    "streaming_dedup",
    "streaming_outer_join",
    "streaming_sliding",
    "streaming_stateful_totals",
    "streaming_stream_join",
    "streaming_timeout_sessions",
    "streaming_tumbling",
    "table_profile",
    "textstats_transform",
    "topk_transform",
    "tpch_q1_like",
    "triangle_count",
    "unigram_logprob",
    "wav_frame_features",
    "winsorize_prices",
]

R8_OLDEST_TWELVE = [
    "action_transform",
    "aggregation_transform",
    "ann_ivf_topk",
    "ann_sq8_topk",
    "array_filter_dsl",
    "bigram_logprob",
    "bpe_train_batched",
    "corpus_clean_cc",
    "decontaminate",
    "dedup_clusters",
    "dedup_containment_zipf",
    "dedup_exact",
]


def test_window_layout():
    q = list(suite.all_queries())
    assert len(q) == len(set(q)), "duplicate query names"
    assert list(q[:50]) == list(suite._WINDOW)
    # slots 1-4: the never-driver-gated round-10 additions, alphabetical
    assert q[:4] == NEVER_GATED_R10_QUARTET
    assert NEVER_GATED_R10_QUARTET == sorted(NEVER_GATED_R10_QUARTET)
    # slots 5-38: the full remaining r7-green block, alphabetical
    assert q[4:38] == R7_STALE_THIRTYFOUR
    assert R7_STALE_THIRTYFOUR == sorted(R7_STALE_THIRTYFOUR)
    # slots 39-50: the first twelve r8-greens, alphabetical
    assert q[38:50] == R8_OLDEST_TWELVE
    assert R8_OLDEST_TWELVE == sorted(R8_OLDEST_TWELVE)


def test_window_names_exist_in_pool():
    pool, _ = suite._pool()
    missing = [n for n in suite._WINDOW if n not in pool]
    assert not missing, f"_WINDOW names not registered anywhere: {missing}"


def test_every_query_has_matching_oracle_keys():
    q = suite.all_queries()
    o = suite.all_oracles()
    # oracles must never reference a nonexistent query
    assert set(o) <= set(q)
