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


def _ref_bpe_batched(word_counts, merges, passes=6, batch=8):
    """Pure-python replay of the BATCHED selection contract
    (operators/bpe.py module docstring): fixed ceil(merges/batch) round
    schedule, (n desc, l, r) rank, top-16·batch candidate cap, dominance
    filter on symbol overlap, first min(batch, merges−batch·r)
    qualifying pairs per round."""
    state = {}
    for w, c in word_counts.items():
        s = " " + " ".join(list(w)) + " "
        state[s] = state.get(s, 0) + c
    learned = []
    n_rounds = -(-merges // batch)
    for rnd in range(n_rounds):
        pairs = {}
        for s, c in state.items():
            arr = s.strip().split(" ")
            for i in range(len(arr) - 1):
                pairs[(arr[i], arr[i + 1])] = pairs.get((arr[i], arr[i + 1]), 0) + c
        cand = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[: 16 * batch]
        picked, limit = [], min(batch, merges - batch * rnd)
        for i, ((l, r), n) in enumerate(cand):
            syms = {l, r}
            if any(pl in syms or pr in syms for (pl, pr), _ in cand[:i]):
                continue
            picked.append((l, r, n))
            if len(picked) == limit:
                break
        if not picked:
            break
        new_state = {}
        for s, c in state.items():
            for l, r, _ in picked:
                pat, rep = f" {l} {r} ", f" {l}{r} "
                for _ in range(passes):
                    s = s.replace(pat, rep)
            new_state[s] = new_state.get(s, 0) + c
        for l, r, n in picked:
            learned.append((len(learned) + 1, l, r, n))
        state = new_state
    return learned


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_bpe_train_batched_matches_reference(spark, seed):
    from reactivedb_spark.operators.bpe import bpe_train

    rng = random.Random(seed)
    vocab = ["".join(rng.choices("abcdef", k=rng.randint(2, 7))) for _ in range(40)]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(3, 12))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    counts = {}
    for _, text in docs:
        for w in text.split(" "):
            counts[w] = counts.get(w, 0) + 1
    expected = _ref_bpe_batched(counts, merges=12, batch=4)
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["n_pair"])
        for r in bpe_train(df, "text", merges=12, batch=4)
        .orderBy("merge_rank").collect()
    ]
    assert got == expected


def test_bpe_batch_is_symbol_disjoint_and_batch1_is_sequential(spark):
    from reactivedb_spark.operators.bpe import bpe_train

    docs = [(i, "banana bandana cabana banana") for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    seq = [(r["left_sym"], r["right_sym"], r["n_pair"])
           for r in bpe_train(df, "text", merges=3, batch=1)
           .orderBy("merge_rank").collect()]
    ref = _ref_bpe(
        {"banana": 20, "bandana": 10, "cabana": 10}, merges=3)
    assert seq == [(l, r, n) for _, l, r, n in ref]
    # one batched round: selected pairs must be pairwise symbol-disjoint
    batched = [(r["left_sym"], r["right_sym"])
               for r in bpe_train(df, "text", merges=3, batch=3)
               .orderBy("merge_rank").collect()]
    seen = set()
    for l, r in batched:
        assert l not in seen and r not in seen
        seen.update((l, r))
