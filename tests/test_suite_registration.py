"""Registration-order contract: the driver's correctness gate checks the
FIRST 50 registered queries, so every query family that has never had a
green driver row (pipeline, analytics, olap, the _PRIORITY scale
additions) must land inside that window. Families with prior driver-green
rows (core: rounds 1-3; sessionize: round 2; the dedup/similarity/
multimodal scale family: round 3) fill the tail. New queries must not
silently push a never-verified family out."""

from reactivedb_spark import suite


def test_window_covers_never_verified_families():
    q = list(suite.all_queries())
    assert len(q) == len(set(q)), "duplicate query names"
    window = set(q[:50])
    need = (
        set(suite.pipeline.QUERIES)
        | set(suite.analytics.QUERIES)
        | set(suite.olap.QUERIES)
        | set(suite._PRIORITY)
    )
    missing = need - window
    assert not missing, (
        f"never-driver-verified queries outside the 50-query window: {sorted(missing)}"
    )


def test_window_is_exactly_the_never_verified_set():
    # the window should not waste slots on already-green queries while
    # never-verified ones wait in the tail
    q = list(suite.all_queries())
    window = q[:50]
    need = (
        set(suite.pipeline.QUERIES)
        | set(suite.analytics.QUERIES)
        | set(suite.olap.QUERIES)
        | set(suite._PRIORITY)
    )
    assert len(need) == 50
    assert set(window) == need


def test_every_query_has_matching_oracle_keys():
    q = suite.all_queries()
    o = suite.all_oracles()
    # oracles must never reference a nonexistent query
    assert set(o) <= set(q)
