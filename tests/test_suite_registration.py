"""Registration-order contract: the driver's correctness gate checks the
FIRST 50 registered queries. Round-5 rotation (VERDICT r4 #1): the 12
never-driver-checked round-4 tail queries occupy the head of the window,
followed by the stalest driver-green families (fewest green rows first);
everything else — latest evidence r3/r4, i.e. ≤2 rounds old — fills the
tail and rotates back next round."""

from reactivedb_spark import suite

NEVER_CHECKED = {
    "zscore_outliers",
    "span_dedup_rewrite",
    "chunk_transform",
    "zorder_scan",
    "full_outer_join",
    "textstats_transform",
    "pq_rerank",
    "bucketed_join",
    "funnel_stages",
    "source_schema_evolution",
    "store_time_travel",
    "dedup_containment",
}


def test_window_layout():
    q = list(suite.all_queries())
    assert len(q) == len(set(q)), "duplicate query names"
    assert list(q[:50]) == list(suite._WINDOW)
    # every never-driver-checked query sits in the head of the window
    assert NEVER_CHECKED <= set(q[: len(NEVER_CHECKED)] )


def test_window_names_exist_in_pool():
    pool, _ = suite._pool()
    missing = [n for n in suite._WINDOW if n not in pool]
    assert not missing, f"_WINDOW names not registered anywhere: {missing}"


def test_every_query_has_matching_oracle_keys():
    q = suite.all_queries()
    o = suite.all_oracles()
    # oracles must never reference a nonexistent query
    assert set(o) <= set(q)
