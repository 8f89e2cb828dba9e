"""Unit tests for the round-8 tail operators: fuzzy edit-distance join
(lossless-filter property vs a brute-force DP), 2-D skyline (dominance
brute force, tie semantics), label propagation (hand-checked communities),
and CDC changelog application (update/delete/insert/no-op paths)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_pairs(rows, d):
    out = set()
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        if abs(len(ta) - len(tb)) <= d and _lev(ta, tb) <= d:
            out.add((min(ia, ib), max(ia, ib), _lev(ta, tb)))
    return out


def test_edit_distance_join_matches_bruteforce(spark):
    from reactivedb_spark.operators.fuzzyjoin import edit_distance_join

    rows = [
        (1, "ab"),          # short pool (len <= 3 at q=2, d=1)
        (2, "abc"),         # short pool
        (3, "abcd"),        # long side, ed 1 from "abc" (cross-boundary)
        (4, "abce"),        # ed 1 from "abcd"
        (5, "abcd"),        # exact duplicate of 3 (ed 0)
        (6, "xbcd"),        # ed 1 from "abcd"
        (7, "zzzzzz"),      # isolated
        (8, "a"),           # shortest possible
        (9, "b"),           # ed 1 from "a"
        (10, "banana"),     # repeated grams exercise the occ index
        (11, "banena"),     # ed 1 from banana
        (12, "bananas"),    # ed 1 from banana
    ]
    df = spark.createDataFrame(rows, ["id", "txt"])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(df, "id", "txt", max_dist=1).collect()
    }
    assert got == _brute_pairs(rows, 1)


def test_edit_distance_join_d2(spark):
    from reactivedb_spark.operators.fuzzyjoin import edit_distance_join

    rows = [(i, t) for i, t in enumerate(
        ["kitten", "sitten", "sittin", "sitting", "mitten", "kittens",
         "smitten", "bitten", "flitting", "kit", "kat", "knitting"])]
    df = spark.createDataFrame(rows, ["id", "txt"])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(df, "id", "txt", max_dist=2).collect()
    }
    assert got == _brute_pairs(rows, 2)


def test_pareto_front_tie_semantics(spark):
    from reactivedb_spark.operators.skyline import pareto_front

    rows = [
        # (grp, id, price, size)
        ("a", 1, 10.0, 5),   # frontier
        ("a", 2, 10.0, 5),   # duplicate of 1 — both survive
        ("a", 3, 10.0, 4),   # dominated by 1 (tied price, smaller size)
        ("a", 4, 9.5, 3),    # frontier (cheaper)
        ("a", 5, 11.0, 5),   # dominated by 1 (pricier, same size)
        ("a", 6, 12.0, 9),   # frontier (bigger than everything)
        ("b", 7, 100.0, 1),  # alone in group — frontier
    ]
    df = spark.createDataFrame(rows, ["grp", "id", "price", "size"])
    got = {r.id for r in
           pareto_front(df, ["grp"], "price", "size").collect()}
    assert got == {1, 2, 4, 6, 7}


def test_pareto_front_matches_bruteforce(spark):
    from reactivedb_spark.operators.skyline import pareto_front

    import random
    rnd = random.Random(8)
    rows = [("g%d" % (i % 3), i, float(rnd.randint(0, 9)), rnd.randint(0, 9))
            for i in range(120)]
    df = spark.createDataFrame(rows, ["grp", "id", "price", "size"])
    got = {r.id for r in pareto_front(df, ["grp"], "price", "size").collect()}
    want = set()
    for g, i, p, s in rows:
        dominated = any(
            g2 == g and p2 <= p and s2 >= s and (p2 < p or s2 > s)
            for g2, _, p2, s2 in rows)
        if not dominated:
            want.add(i)
    assert got == want


def test_label_propagation_two_cliques(spark):
    from reactivedb_spark.operators.graph import label_propagation

    # two 4-cliques {1..4} {11..14} joined by one bridge 4-11: the
    # frequency rule keeps each clique on its own min label.
    def clique(ns):
        return [(a, b) for a, b in itertools.combinations(ns, 2)]

    edges = clique([1, 2, 3, 4]) + clique([11, 12, 13, 14]) + [(4, 11)]
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {r.node: r.label for r in label_propagation(df, rounds=3).collect()}
    assert {got[n] for n in (1, 2, 3)} == {1}
    assert {got[n] for n in (12, 13, 14)} == {11}


def test_apply_changelog_paths(spark):
    from reactivedb_spark.operators.cdc import apply_changelog

    snap = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], ["k", "bal"])
    ch = spark.createDataFrame(
        [
            (1, "upsert", 11.0, 1),   # overwritten by seq 2
            (1, "upsert", 12.0, 2),   # final: update
            (2, "delete", None, 1),   # final: delete
            (4, "upsert", 40.0, 1),   # final: insert (new key)
            (5, "delete", None, 1),   # delete of absent key: no-op
            (6, "upsert", 60.0, 1),   # overwritten by delete
            (6, "delete", None, 2),   # final: net no-op insert+delete
        ],
        ["k", "op", "bal", "seq"],
    )
    out = apply_changelog(snap, ch, key="k", payload_cols=["bal"],
                          seq_cols=["seq"])
    got = {r.k: r.bal for r in out.collect()}
    assert got == {1: 12.0, 3: 30.0, 4: 40.0}


def test_association_rules_small(spark):
    from reactivedb_spark.operators.assoc import association_rules

    # 4 baskets: {1,2,3} {1,2} {1,2} {3}
    rows = [(10, 1), (10, 2), (10, 3), (11, 1), (11, 2),
            (12, 1), (12, 2), (13, 3)]
    df = spark.createDataFrame(rows, ["b", "i"])
    out = {(r.antecedent, r.consequent): r
           for r in association_rules(df, "b", "i", min_count=2).collect()}
    assert set(out) == {(1, 2), (2, 1)}
    r = out[(1, 2)]
    # n_pair=3, N=4, n1=3, n2=3
    assert r.n_pair == 3
    assert r.support_ppm == 750000
    assert r.confidence_ppm == 1000000
    assert r.lift_ppm == (3 * 4 * 1000000) // 9


def test_trigram_search_exactness(spark):
    from reactivedb_spark.operators.retrieval import trigram_search

    docs = [
        (1, "the quick brown fox"),
        (2, "quick brownies for the win"),  # substring hit: 'quick brown'ies
        (3, "brow nquick"),            # trigram soup, no contiguous match
        (4, "xxx quick brown xxx"),
        (5, None),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {(r.pattern, r.doc_id)
           for r in trigram_search(df, "doc_id", "text",
                                   ["quick brown", "the "]).collect()}
    want = {("quick brown", 1), ("quick brown", 2), ("quick brown", 4),
            ("the ", 1), ("the ", 2)}
    assert got == want


def test_trigram_search_rejects_short_patterns(spark):
    import pytest as _pytest

    from reactivedb_spark.operators.retrieval import trigram_search

    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        trigram_search(df, "doc_id", "text", ["ab"])


def test_audit_detects_violations(spark):
    from reactivedb_spark.operators.quality import audit

    child = spark.createDataFrame(
        [(1, 1, 5.0), (1, 1, -2.0), (2, 1, None), (3, 9, 1.0)],
        ["ok", "ln", "amt"])
    parent = spark.createDataFrame([(1,), (2,)], ["pk"])
    got = {r.metric: r.value for r in audit(
        child,
        checks={"amt_pos": F.col("amt") > 0},
        pk=["ok", "ln"],
        fk=(parent, ["ok"], ["pk"]),
    ).collect()}
    assert got == {
        "rows": 4,
        "violations:amt_pos": 2,  # -2.0 and NULL both violate
        "pk_duplicate_rows": 1,   # (1,1) twice
        "fk_orphan_rows": 1,      # ok=3 has no parent
    }


def test_weighted_median_ties_and_threshold(spark):
    from reactivedb_spark.operators.numeric import weighted_median

    rows = [
        ("a", 1.0, 1), ("a", 2.0, 1), ("a", 3.0, 2),  # tot=4, cum@2=2 -> 2.0
        ("b", 5.0, 3), ("b", 7.0, 1),                 # tot=4, cum@5=3 -> 5.0
        ("c", 9.0, 1),                                # singleton
    ]
    df = spark.createDataFrame(rows, ["g", "v", "w"])
    got = {r.g: r.wmedian
           for r in weighted_median(df, ["g"], "v", "w").collect()}
    assert got == {"a": 2.0, "b": 5.0, "c": 9.0}


def test_time_weighted_avg_steps(spark):
    from reactivedb_spark.operators.temporal import time_weighted_avg

    # value 10.0 held 3ns, then 20.0 held 1ns -> twa = 12.5
    rows = [(1, 0, 0, 10.0), (1, 3, 1, 20.0), (1, 4, 2, 30.0),
            (2, 5, 3, 1.0)]  # single closing obs -> user 2 drops
    df = spark.createDataFrame(rows, ["k", "ts", "eid", "v"])
    out = {r.k: (r.held_ns, r.twa) for r in time_weighted_avg(
        df, ["k"], "ts", "v", scale=2, tiebreak_cols=["eid"]).collect()}
    assert set(out) == {1}
    held, twa = out[1]
    assert held == 4
    assert twa == (1000 * 3 + 2000 * 1) / (4 * 100.0)


def test_snapshot_diff_classes(spark):
    from reactivedb_spark.operators.cdc import snapshot_diff

    before = spark.createDataFrame(
        [(1, 10.0, "x"), (2, 20.0, "y"), (3, None, "z"), (4, 40.0, "w")],
        ["k", "bal", "tag"])
    after = spark.createDataFrame(
        [(1, 10.0, "x"),          # unchanged -> omitted
         (2, 21.0, "y"),          # changed: bal
         (3, 30.0, "q"),          # changed: bal (NULL->value) + tag
         (5, 50.0, "n")],         # added
        ["k", "bal", "tag"])
    got = {r.k: (r.change, r.changed_cols) for r in snapshot_diff(
        before, after, "k", ["bal", "tag"]).collect()}
    assert got == {
        2: ("changed", "bal"),
        3: ("changed", "bal,tag"),
        4: ("removed", ""),
        5: ("added", ""),
    }


def test_dhash_properties(spark):
    from reactivedb_spark.functions import multimodal

    docs = [
        (1, "gradient " * 40),          # structured text
        (2, "gradient " * 40),          # exact duplicate -> equal hash
        (3, "zzzz" * 90),               # different structure
        (4, "a"),                       # 1-row image (h < grid)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    pay = multimodal.encode_png(df, "doc_id", "text", width=16)
    got = {r.doc_id: r.dhash
           for r in multimodal.dhash(pay, "doc_id").collect()}
    assert got[1] == got[2]            # identical pixels, identical hash
    assert got[1] != got[3]            # different content separates
    assert got[4] is not None          # short image still hashes
    assert all(0 <= v < (1 << 56) for v in got.values())


def test_dhash_known_bits(spark):
    from reactivedb_spark.functions import multimodal

    # one 16-byte row: left half high ('~' = 126), right half low (' ').
    # grid rows all map to gr=0; cells 0..3 mean 126, cells 4..7 mean 32
    # -> only the boundary comparison (cell 3 > cell 4) sets a bit: b=3.
    df = spark.createDataFrame([(1, "~~~~~~~~        ")], ["doc_id", "text"])
    pay = multimodal.encode_png(df, "doc_id", "text", width=16)
    [row] = multimodal.dhash(pay, "doc_id").collect()
    assert row.dhash == 1 << 3


def test_bfs_hops_path_graph(spark):
    from reactivedb_spark.operators.graph import bfs_hops

    # path 1-2-3-4-5-6 plus isolated 9; source {1}: hops capped at 3
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (8, 9)], ["u", "v"])
    src = spark.createDataFrame([(1,)], ["node"])
    got = {r.node: r.hops
           for r in bfs_hops(edges, src, max_hops=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_percentile_rank_ties_and_singleton(spark):
    from reactivedb_spark.operators.numeric import percentile_rank

    rows = [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 20.0), ("a", 4, 30.0),
            ("b", 5, 99.0)]
    df = spark.createDataFrame(rows, ["g", "id", "v"])
    got = {r.id: r.pr_ppm
           for r in percentile_rank(df, ["g"], "v").collect()}
    # n=4: ranks 1,2,2,4 -> (0, 1/3, 1/3, 1) in ppm (floor)
    assert got == {1: 0, 2: 333333, 3: 333333, 4: 1000000, 5: 0}


def test_mad_outliers_flags_only_tail(spark):
    from reactivedb_spark.operators.numeric import mad_outliers

    # group: median 10, deviations {0,1,1,2,90} -> MAD=1, k=3 -> only 100.0
    rows = [("g", 1, 10.0), ("g", 2, 9.0), ("g", 3, 11.0), ("g", 4, 12.0),
            ("g", 5, 100.0)]
    df = spark.createDataFrame(rows, ["g", "id", "v"])
    got = {r.id for r in mad_outliers(df, ["g"], "v", k=3).collect()}
    assert got == {5}


def test_edit_distance_join_randomized(spark):
    from reactivedb_spark.operators.fuzzyjoin import edit_distance_join

    import random
    rnd = random.Random(88)
    rows = [(i, "".join(rnd.choice("abc")
                        for _ in range(rnd.randint(1, 9))))
            for i in range(60)]
    df = spark.createDataFrame(rows, ["id", "txt"])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(df, "id", "txt", max_dist=1).collect()
    }
    assert got == _brute_pairs(rows, 1)
