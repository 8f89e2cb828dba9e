"""Connected components: known component structures, chains deeper than
one propagation round, and determinism of labels."""

import pytest
from pyspark.sql import functions as F

from reactivedb_spark.operators.graph import connected_components


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return {
        r.node: r.cluster for r in connected_components(df).collect()
    }


def test_chain_collapses_transitively(spark):
    # 0-1-2-3-4 chain plus separate 10-11; chain needs >1 round
    got = _cc(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10, 11: 10}


def test_cycle_and_bridge(spark):
    got = _cc(spark, [(5, 6), (6, 7), (7, 5), (7, 20), (30, 31)])
    assert got == {5: 5, 6: 5, 7: 5, 20: 5, 30: 30, 31: 30}


def test_long_path_converges(spark):
    n = 40  # diameter 40: exercises repeated rounds + lineage cutting
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert set(got.values()) == {0} and len(got) == n + 1


def test_nonconvergence_raises_not_partial(spark):
    """A chain deeper than the round budget must raise, not silently
    return unconverged labels."""
    import pytest

    df = spark.createDataFrame([(i, i + 1) for i in range(12)],
                               "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(df, max_iter=3)


class TestStarContraction:
    def _star(self, spark, pairs):
        from reactivedb_spark.operators.graph import connected_components_star

        df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
        rows = connected_components_star(df).collect()
        got = {}
        for r in rows:
            assert r.node not in got, f"duplicate label for node {r.node}"
            got[r.node] = r.cluster
        return got

    def test_matches_frontier_on_mixed_graph(self, spark):
        pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (5, 6), (6, 7),
                 (7, 5), (7, 20), (30, 31), (2, 0), (41, 40), (40, 42)]
        assert self._star(spark, pairs) == _cc(spark, pairs)

    def test_deep_chain_beyond_frontier_budget(self, spark):
        """Diameter 200 — frontier propagation would need 200 rounds (it
        raises at max_iter=50); star contraction converges in O(log²)."""
        pairs = [(i, i + 1) for i in range(200)]
        got = self._star(spark, pairs)
        assert set(got.values()) == {0} and len(got) == 201

    def test_star_shaped_input_converges_immediately(self, spark):
        got = self._star(spark, [(0, i) for i in range(1, 8)])
        assert got == {i: 0 for i in range(8)}


def test_pagerank_star_center_dominates(spark):
    from reactivedb_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "doc_a long, doc_b long"
    )
    pr = {r["node"]: r["pr"] for r in pagerank(edges, iters=10).collect()}
    assert set(pr) == set(range(6))
    assert all(pr[0] > pr[i] for i in range(1, 6))   # hub outranks leaves
    assert abs(sum(pr.values()) - 1.0) < 1e-6        # mass conserved
    leaf_vals = {round(pr[i], 12) for i in range(1, 6)}
    assert len(leaf_vals) == 1                        # symmetric leaves tie


@pytest.mark.parametrize("seed,k", [(41, 2), (42, 3), (43, 4)])
def test_k_core_matches_bruteforce(spark, seed, k):
    """k_core vs a pure-python peel on random graphs — membership AND
    within-core degree."""
    import random

    from reactivedb_spark.operators.graph import k_core

    rng = random.Random(seed)
    n = 30
    edges = set()
    for _ in range(80):
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    # reference peel
    adj = {i: set() for i in range(n)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    while True:
        drop = [x for x, s in adj.items() if len(s) < k]
        if not drop:
            break
        for x in drop:
            for m in adj[x]:
                adj[m].discard(x)
            del adj[x]
    expected = sorted((x, len(s)) for x, s in adj.items() if s or x in adj)
    expected = [(x, d) for x, d in expected if d > 0 or k == 0]
    df = spark.createDataFrame(sorted(edges), "u long, v long")
    got = sorted(
        (r["node"], r["core_degree"]) for r in k_core(df, k=k).collect()
    )
    assert got == expected
