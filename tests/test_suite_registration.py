"""Registration-order contract: the driver's correctness gate checks the
FIRST 50 registered queries. Round-10 rotation (the plan committed in
round 9, executed verbatim — VERDICT r9 #1): slots 1-3 are the round-9
additions that have NEVER been driver-gated (alphabetical); slots 4-34
are the full remaining r6-stale block (31 queries, alphabetical) — after
this gate no query's newest green is older than r7; slots 35-50 are the
sixteen oldest-r7 queries, alphabetical. Everything else fills the tail
and rotates per the ROUND-11 plan written in suite/__init__.py."""

from reactivedb_spark import suite

NEVER_GATED_R9_TRIO = [
    "dsir_weights",
    "length_buckets",
    "listen_cascade_events",
]

R6_STALE_THIRTYONE = [
    "ann_buckets",
    "dedup_simhash",
    "dedup_transform",
    "duplicate_spans",
    "embedding_clusters",
    "embedding_near_dups",
    "event_deltas",
    "events_json",
    "fingerprint",
    "grouping_sets",
    "hll_users",
    "lang_id",
    "multimodal_decode",
    "multimodal_frames",
    "multimodal_pixel_features",
    "multimodal_resize",
    "pq_topk",
    "price_deciles",
    "price_histogram",
    "range_join_attrib",
    "resample_gapfill",
    "retention_weeks",
    "rolling_avg",
    "sample_transform",
    "sample_weighted",
    "similarity_topk",
    "skew_salted_agg",
    "text_quality",
    "token_count",
    "topk_orders",
    "window_rank",
]

R7_OLDEST_SIXTEEN = [
    "anti_join",
    "asof_join",
    "bpe_encode",
    "bpe_train",
    "bucketed_join",
    "char_entropy",
    "chunk_transform",
    "corr_matrix",
    "cube_orders",
    "dedup_containment",
    "dedup_containment_exact",
    "dedup_jaccard_guarded",
    "distinct_agg",
    "full_outer_join",
    "funnel_stages",
    "join_transform",
]


def test_window_layout():
    q = list(suite.all_queries())
    assert len(q) == len(set(q)), "duplicate query names"
    assert list(q[:50]) == list(suite._WINDOW)
    # slots 1-3: the never-driver-gated round-9 additions, alphabetical
    assert q[:3] == NEVER_GATED_R9_TRIO
    assert NEVER_GATED_R9_TRIO == sorted(NEVER_GATED_R9_TRIO)
    # slots 4-34: the full remaining r6-stale block, alphabetical
    assert q[3:34] == R6_STALE_THIRTYONE
    assert R6_STALE_THIRTYONE == sorted(R6_STALE_THIRTYONE)
    # slots 35-50: sixteen oldest-r7 queries, alphabetical
    assert q[34:50] == R7_OLDEST_SIXTEEN
    assert R7_OLDEST_SIXTEEN == sorted(R7_OLDEST_SIXTEEN)


def test_window_names_exist_in_pool():
    pool, _ = suite._pool()
    missing = [n for n in suite._WINDOW if n not in pool]
    assert not missing, f"_WINDOW names not registered anywhere: {missing}"


def test_every_query_has_matching_oracle_keys():
    q = suite.all_queries()
    o = suite.all_oracles()
    # oracles must never reference a nonexistent query
    assert set(o) <= set(q)
