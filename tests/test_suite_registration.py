"""Registration-order contract: the driver's correctness gate checks the
FIRST 50 registered queries. Round-6 rotation (VERDICT r5 #1): the 16
queries whose newest green row is r3 occupy slots 1-16 (the heavy
word-level dedup family must re-verify under the round-5 64-bit SimHash
and stop-band-guard code), the two new round-6 queries follow, and the
single-green round-4 set (alphabetical) fills the rest; everything else
— latest evidence r4/r5, i.e. <=2 rounds old — fills the tail and
rotates back next round."""

from reactivedb_spark import suite

R3_STALE = [
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
]

NEVER_CHECKED = {
    "dedup_containment_zipf",
    "streaming_late_data",
    "streaming_dedup_watermark",
    "expr_functions",
    "semantic_dedup",
}


def test_window_layout():
    q = list(suite.all_queries())
    assert len(q) == len(set(q)), "duplicate query names"
    assert list(q[:50]) == list(suite._WINDOW)
    # the r3-stale set leads the window, the never-driver-checked round-6
    # queries follow immediately
    assert q[: len(R3_STALE)] == R3_STALE
    assert set(q[len(R3_STALE): len(R3_STALE) + len(NEVER_CHECKED)]) == NEVER_CHECKED


def test_window_names_exist_in_pool():
    pool, _ = suite._pool()
    missing = [n for n in suite._WINDOW if n not in pool]
    assert not missing, f"_WINDOW names not registered anywhere: {missing}"


def test_every_query_has_matching_oracle_keys():
    q = suite.all_queries()
    o = suite.all_oracles()
    # oracles must never reference a nonexistent query
    assert set(o) <= set(q)
