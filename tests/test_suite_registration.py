"""Registration-order contract: the driver's correctness gate checks the
FIRST 50 registered queries. Round-7 rotation (VERDICT r6 #1): the 21
queries whose newest green row is r4 occupy slots 1-21 with
``streaming_dedup`` first (it switched to the RocksDB state-store
provider after its last green row, so its rotation green is also the
provider-invariance proof); the sixteen NEW round-7 queries
(streaming_outer_join, wav_frame_features, triangle_count,
char_entropy, bpe_train, streaming_timeout_sessions, join_transform,
phrase_search, ngram_novelty, regression_by_group,
stream_static_enrich, topk_transform, kmeans_iterate, ks_drift,
corr_matrix, bpe_encode — driver-unchecked by definition) take slots
22-37; 13 of the 15 single-green-r5 queries fill slots 38-50
(zorder_scan and zscore_outliers, alphabetically last, join the
displaced tail — their newest green stays r5 like the displaced
double-green set).
Everything else — latest evidence r5/r6, i.e. <=2 rounds old — fills
the tail and rotates back next round."""

from reactivedb_spark import suite

R4_STALE = [
    "streaming_dedup",  # leads: RocksDB provider adopted after last green
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
]

NEW_R7 = ["streaming_outer_join", "wav_frame_features", "triangle_count",
          "char_entropy", "bpe_train", "streaming_timeout_sessions",
          "join_transform", "phrase_search", "ngram_novelty",
          "regression_by_group", "stream_static_enrich",
          "topk_transform", "kmeans_iterate", "ks_drift", "corr_matrix",
          "bpe_encode"]

SINGLE_GREEN_R5 = [
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
]


def test_window_layout():
    q = list(suite.all_queries())
    assert len(q) == len(set(q)), "duplicate query names"
    assert list(q[:50]) == list(suite._WINDOW)
    # the r4-stale set leads the window (streaming_dedup first), the
    # never-checked round-7 queries follow, then the single-green-r5 set
    assert q[: len(R4_STALE)] == R4_STALE
    n = len(R4_STALE)
    assert q[n: n + len(NEW_R7)] == NEW_R7
    n += len(NEW_R7)
    assert q[n: n + len(SINGLE_GREEN_R5)] == SINGLE_GREEN_R5
    # slots 44-50 are alphabetical
    tail = q[n + len(SINGLE_GREEN_R5): 50]
    assert tail == sorted(tail)


def test_window_names_exist_in_pool():
    pool, _ = suite._pool()
    missing = [n for n in suite._WINDOW if n not in pool]
    assert not missing, f"_WINDOW names not registered anywhere: {missing}"


def test_every_query_has_matching_oracle_keys():
    q = suite.all_queries()
    o = suite.all_oracles()
    # oracles must never reference a nonexistent query
    assert set(o) <= set(q)
