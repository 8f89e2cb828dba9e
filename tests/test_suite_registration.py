"""Registration-order contract: the driver's correctness gate checks the
FIRST 50 registered queries, so the least-recently-verified families
(analytics, olap, sessionize, core) must all land inside that window.
New queries must not silently push a required family out."""

from reactivedb_spark import suite


def test_window_covers_priority_families():
    q = list(suite.all_queries())
    assert len(q) == len(set(q)), "duplicate query names"
    window = set(q[:50])
    need = (
        set(suite.analytics.QUERIES)
        | set(suite.olap.QUERIES)
        | {"sessionize"}
        | set(suite.core.QUERIES)
    )
    missing = need - window
    assert not missing, (
        f"priority queries outside the driver's 50-query window: {sorted(missing)}"
    )


def test_every_query_has_matching_oracle_keys():
    q = suite.all_queries()
    o = suite.all_oracles()
    # oracles must never reference a nonexistent query
    assert set(o) <= set(q)
