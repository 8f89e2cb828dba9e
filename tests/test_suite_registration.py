"""Registration-order contract: the driver's correctness gate checks the
FIRST 50 registered queries. Round-9 rotation (VERDICT r8 #1, verbatim):
slots 1-34 are the 34 round-8 tail queries that have NEVER been
driver-gated (alphabetical); slots 35-50 are sixteen r6-stale queries,
fewest-greens-first — the r8-displaced nine (the two single-greens
first), then source_csv, source_jsonl, pagerank_orders,
dedup_lsh_candidates, dedup_jaccard, corpus_clean, dedup_minhash.
Everything else — newest evidence r6/r7/r8 — fills the tail and rotates
per the ROUND-10 plan written in suite/__init__.py."""

from reactivedb_spark import suite

NEVER_GATED_R8_TAIL = [
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
]

R6_STALE_SIXTEEN = [
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
]


def test_window_layout():
    q = list(suite.all_queries())
    assert len(q) == len(set(q)), "duplicate query names"
    assert list(q[:50]) == list(suite._WINDOW)
    # slots 1-34: the never-driver-gated round-8 tail, alphabetical
    assert q[:34] == NEVER_GATED_R8_TAIL
    assert NEVER_GATED_R8_TAIL == sorted(NEVER_GATED_R8_TAIL)
    # slots 35-50: the sixteen r6-stale queries in VERDICT's order
    assert q[34:50] == R6_STALE_SIXTEEN


def test_window_names_exist_in_pool():
    pool, _ = suite._pool()
    missing = [n for n in suite._WINDOW if n not in pool]
    assert not missing, f"_WINDOW names not registered anywhere: {missing}"


def test_every_query_has_matching_oracle_keys():
    q = suite.all_queries()
    o = suite.all_oracles()
    # oracles must never reference a nonexistent query
    assert set(o) <= set(q)
