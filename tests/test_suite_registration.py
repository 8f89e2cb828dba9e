"""Registration-order contract: the driver's correctness gate checks the
FIRST 50 registered queries. Round-8 rotation (VERDICT r7 #1):
``join_transform_diamond`` — the only registered query with zero driver
evidence — takes slot 1; the 37 queries whose newest green row is r5
fill slots 2-38 alphabetically; the five NEW/CHANGED round-8 queries
(bpe_train_batched, corpus_clean_cc, distinct_transform, kcore_parts,
scd2_users, interval_join, impute_docs, bigram_logprob, ann_sq8_topk —
driver-unchecked by definition) take slots 39-47; slots 48-50 hold
three single-green r6 queries (streaming_late_data,
streaming_dedup_watermark, ann_knn_join, asof_forward, bloom_semi_join,
bm25_topk, chunk_windows, cms_heavy_hitters and dag_chain are displaced
by the new queries and lead the r9 r6-block, the two single-greens
first).
Everything else — latest evidence r6/r7, i.e. <=2 rounds old — fills
the tail and rotates back next round."""

from reactivedb_spark import suite

R5_STALE = [
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
]

NEW_R8 = ["bpe_train_batched", "corpus_clean_cc", "distinct_transform",
          "kcore_parts", "scd2_users", "interval_join", "impute_docs",
          "bigram_logprob", "ann_sq8_topk"]

R6_SINGLE_GREEN = [
    "dedup_containment_zipf",
    "expr_functions",
    "semantic_dedup",
]

R6_DOUBLE_GREEN_HEAD = []


def test_window_layout():
    q = list(suite.all_queries())
    assert len(q) == len(set(q)), "duplicate query names"
    assert list(q[:50]) == list(suite._WINDOW)
    # slot 1: the only never-driver-gated query
    assert q[0] == "join_transform_diamond"
    # slots 2-38: the r5-stale set, alphabetical
    assert q[1: 1 + len(R5_STALE)] == R5_STALE
    assert R5_STALE == sorted(R5_STALE)
    n = 1 + len(R5_STALE)
    # slots 39-40: the new round-8 queries
    assert q[n: n + len(NEW_R8)] == NEW_R8
    n += len(NEW_R8)
    # slots 41-45: r6 single-green; 46-50: r6 double-green alphabetical
    assert q[n: n + len(R6_SINGLE_GREEN)] == R6_SINGLE_GREEN
    n += len(R6_SINGLE_GREEN)
    assert q[n: 50] == R6_DOUBLE_GREEN_HEAD
    assert R6_DOUBLE_GREEN_HEAD == sorted(R6_DOUBLE_GREEN_HEAD)


def test_window_names_exist_in_pool():
    pool, _ = suite._pool()
    missing = [n for n in suite._WINDOW if n not in pool]
    assert not missing, f"_WINDOW names not registered anywhere: {missing}"


def test_every_query_has_matching_oracle_keys():
    q = suite.all_queries()
    o = suite.all_oracles()
    # oracles must never reference a nonexistent query
    assert set(o) <= set(q)
