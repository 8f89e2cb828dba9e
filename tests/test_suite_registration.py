"""Registration-order contract: the driver's correctness gate checks the
FIRST 50 registered queries. Round-12 rotation (the plan committed in
round 11, executed verbatim — VERDICT r11 #1): slot 1 is wire_roundtrip,
the only query that has NEVER been driver-gated (registered r11 per the
r10 #5 demand); slots 2-39 are the full remaining r8-green block (38
queries, alphabetical, including the §2 flagship verbs/transforms) —
after this gate no query's newest green is older than r9; slots 40-50
are the first eleven r9-greens, alphabetical. Everything else fills the
tail and rotates per the ROUND-13 plan written in suite/__init__.py."""

from reactivedb_spark import suite

NEVER_GATED = ["wire_roundtrip"]

R8_STALE_THIRTYEIGHT = [
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "delete_cascade",
    "distinct_transform",
    "events_hourly",
    "expr_arithmetic",
    "expr_functions",
    "filter_transform",
    "find_one",
    "function_transform",
    "get_all",
    "graph_components_star",
    "greater_than",
    "impute_docs",
    "interval_join",
    "join_transform_diamond",
    "kcore_parts",
    "less_than",
    "multimodal_embed",
    "multimodal_png_decode",
    "multimodal_wav_decode",
    "pack_budget",
    "pii_scrub",
    "sample_hash",
    "sample_stratified",
    "scd2_users",
    "semantic_dedup",
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

R9_OLDEST_ELEVEN = [
    "ann_knn_join",
    "asof_forward",
    "assoc_rules",
    "bfs_hops",
    "bloom_semi_join",
    "bm25_topk",
    "burst_detection",
    "chunk_windows",
    "cms_heavy_hitters",
    "corpus_clean",
    "cumulative_distinct",
]


def test_window_layout():
    q = list(suite.all_queries())
    assert len(q) == len(set(q)), "duplicate query names"
    assert list(q[:50]) == list(suite._WINDOW)
    # slot 1: the only never-driver-gated query
    assert q[:1] == NEVER_GATED
    # slots 2-39: the full remaining r8-green block, alphabetical
    assert q[1:39] == R8_STALE_THIRTYEIGHT
    assert R8_STALE_THIRTYEIGHT == sorted(R8_STALE_THIRTYEIGHT)
    # slots 40-50: the first eleven r9-greens, alphabetical
    assert q[39:50] == R9_OLDEST_ELEVEN
    assert R9_OLDEST_ELEVEN == sorted(R9_OLDEST_ELEVEN)


def test_window_names_exist_in_pool():
    pool, _ = suite._pool()
    missing = [n for n in suite._WINDOW if n not in pool]
    assert not missing, f"_WINDOW names not registered anywhere: {missing}"


def test_every_query_has_matching_oracle_keys():
    q = suite.all_queries()
    o = suite.all_oracles()
    # oracles must never reference a nonexistent query
    assert set(o) <= set(q)
