"""Differential property tests for the round-7 algorithmic operators:

- triangle_count vs a brute-force itertools count over seeded random
  graphs (the degree orientation must never change the total, and the
  wedge count must equal the orientation's Σ C(outdeg, 2));
- bpe_train vs a pure-Python reference implementing the DECLARED merge
  rule (argmax pair by (count desc, left, right); 6-pass left-to-right
  non-overlapping replace) over seeded random corpora.
"""

from __future__ import annotations

import itertools
import random

import pytest

from pyspark.sql import functions as F


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_triangle_count_matches_bruteforce(spark, seed):
    from reactivedb_spark.cache import cache_scope
    from reactivedb_spark.operators.graph import triangle_count

    rng = random.Random(seed)
    n = 18
    edges = sorted(
        {(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.3}
    )
    adj = {v: set() for v in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expected_tri = sum(
        1 for a, b, c in itertools.combinations(range(n), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    deg = {v: len(adj[v]) for v in range(n)}
    out = {v: 0 for v in range(n)}
    for a, b in edges:
        src = a if (deg[a], a) < (deg[b], b) else b
        out[src] += 1
    expected_wedges = sum(o * (o - 1) // 2 for o in out.values())

    df = spark.createDataFrame(edges, "u long, v long")
    with cache_scope():
        row = triangle_count(df).collect()[0]
    assert row["n_edges"] == len(edges)
    assert row["n_wedges"] == expected_wedges
    assert row["n_triangles"] == expected_tri


def _ref_bpe(words_with_counts, merges=4, passes=6):
    """Pure-Python replay of the DECLARED bpe_train rule."""
    state = {" " + " ".join(w) + " ": c for w, c in words_with_counts.items()}
    learned = []
    for rank in range(1, merges + 1):
        pairs = {}
        for s, c in state.items():
            arr = s.strip().split(" ")
            for i in range(len(arr) - 1):
                pairs[(arr[i], arr[i + 1])] = pairs.get((arr[i], arr[i + 1]), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), n = best
        learned.append((rank, left, right, n))
        pat, rep = f" {left} {right} ", f" {left}{right} "
        new_state = {}
        for s, c in state.items():
            for _ in range(passes):
                s = s.replace(pat, rep)
            new_state[s] = new_state.get(s, 0) + c
        state = new_state
    return learned


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_bpe_train_matches_reference(spark, seed):
    from reactivedb_spark.operators.bpe import bpe_train

    rng = random.Random(seed)
    vocab = ["".join(rng.choices("abcd", k=rng.randint(1, 6))) for _ in range(30)]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(3, 12))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    counts = {}
    for _, text in docs:
        for w in text.split(" "):
            counts[w] = counts.get(w, 0) + 1
    expected = _ref_bpe(counts, merges=4)
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["n_pair"])
        for r in bpe_train(df, "text", merges=4).orderBy("merge_rank").collect()
    ]
    assert got == expected
