"""Semantics + plan contracts for the late-round-7 operators:
positional phrase matching, per-doc n-gram novelty, group-wise
exact-sum OLS, and the stream-static enrichment join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# -- phrase_match ---------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_phrase_match_counts_overlapping_occurrences(spark):
    from reactivedb_spark.operators.retrieval import phrase_match

    docs = _docs(spark, [
        (1, "a a a"),          # "a a" overlaps: starts at 0 and 1
        (2, "a b a b a"),      # "a b" at 0 and 2
        (3, "b b"),            # no "a a"
        (4, "a"),              # too short
    ])
    got = {r["doc_id"]: r["n_matches"]
           for r in phrase_match(docs, ["a", "a"]).collect()}
    assert got == {1: 2}
    got = {r["doc_id"]: r["n_matches"]
           for r in phrase_match(docs, ["a", "b"]).collect()}
    assert got == {2: 2}


def test_phrase_match_three_term_and_empty_token_handling(spark):
    from reactivedb_spark.operators.retrieval import phrase_match

    # doubled separators must not break adjacency (positions are
    # assigned after dropping empty tokens)
    docs = _docs(spark, [(1, "x  y   z"), (2, "x y q z")])
    got = {r["doc_id"]: r["n_matches"]
           for r in phrase_match(docs, ["x", "y", "z"]).collect()}
    assert got == {1: 1}
    with pytest.raises(ValueError):
        phrase_match(docs, [])


def test_phrase_match_filters_terms_before_join(spark):
    """The posting relation must be filtered to the phrase terms below
    the join (constant predicate in the explode stage) — the plan may
    not join unfiltered corpus-sized sides."""
    from reactivedb_spark.operators.retrieval import phrase_match

    docs = _docs(spark, [(1, "a b c"), (2, "c b a")])
    plan = _plan(phrase_match(docs, ["a", "b"]))
    assert "token#" in plan and "= a" in plan and "= b" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# -- ngram_novelty --------------------------------------------------------------

def test_ngram_novelty_first_seen_semantics(spark):
    from reactivedb_spark.functions.text import ngram_novelty

    eight = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = _docs(spark, [
        (1, eight),                      # 1 gram, first occurrence
        (2, eight),                      # same gram, seen in doc 1
        (3, eight + " w9"),              # grams: [w1..w8] (dup), [w2..w9] (new)
        (4, "w1 w2 w3"),                 # < 8 words: no row
    ])
    rows = {r["doc_id"]: r for r in ngram_novelty(docs, "doc_id", "text").collect()}
    assert set(rows) == {1, 2, 3}
    assert (rows[1]["n_grams"], rows[1]["n_novel"]) == (1, 1)
    assert (rows[2]["n_grams"], rows[2]["n_novel"]) == (1, 0)
    assert (rows[3]["n_grams"], rows[3]["n_novel"]) == (2, 1)
    assert rows[3]["novelty"] == 0.5


def test_ngram_novelty_distinct_within_doc(spark):
    """A gram repeated inside one document counts once (distinct per
    doc), and the doc still owns it if it is globally first."""
    from reactivedb_spark.functions.text import ngram_novelty

    eight = "r r r r r r r r"
    docs = _docs(spark, [(7, eight + " r")])  # two positions, one distinct gram
    [row] = ngram_novelty(docs, "doc_id", "text").collect()
    assert (row["n_grams"], row["n_novel"], row["novelty"]) == (1, 1, 1.0)


# -- ols_by_group ---------------------------------------------------------------

def test_ols_exact_fit_and_constant_x_guard(spark):
    from reactivedb_spark.operators.regression import ols_by_group

    df = spark.createDataFrame(
        # group a: y = 2x + 1 exactly; group b: constant x (undefined fit)
        [("a", 1.0, 3.0), ("a", 2.0, 5.0), ("a", 3.0, 7.0),
         ("b", 4.0, 1.0), ("b", 4.0, 9.0)],
        "g string, x double, y double",
    )
    rows = {r["g"]: r for r in ols_by_group(df, ["g"], "x", "y").collect()}
    assert rows["a"]["n"] == 3
    assert rows["a"]["slope"] == pytest.approx(2.0, abs=1e-12)
    assert rows["a"]["intercept"] == pytest.approx(1.0, abs=1e-12)
    assert rows["b"]["slope"] is None and rows["b"]["intercept"] is None


def test_ols_single_aggregation_no_join(spark):
    """The whole fit must ride ONE hash aggregation: no Exchange beyond
    the group-key shuffle, no join, no window."""
    from reactivedb_spark.operators.regression import ols_by_group

    df = spark.range(100).select(
        (F.col("id") % 5).alias("g"),
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 2).cast("double").alias("y"),
    )
    plan = _plan(ols_by_group(df, ["g"], "x", "y"))
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Exchange") == 1


def test_ols_order_invariance(spark):
    """Decimal sufficient statistics make the fit partition-order-proof:
    any repartitioning yields bit-identical doubles."""
    from reactivedb_spark.operators.regression import ols_by_group

    df = spark.range(1000).select(
        (F.col("id") % 3).alias("g"),
        ((F.col("id") * 37 % 101) / 7.0).alias("x"),
        ((F.col("id") * 53 % 997) / 13.0).alias("y"),
    )
    a = sorted(map(tuple, ols_by_group(df, ["g"], "x", "y").collect()))
    b = sorted(map(tuple, ols_by_group(
        df.repartition(17, "x"), ["g"], "x", "y").collect()))
    assert a == b


# -- kmeans_assignments ----------------------------------------------------------

def test_kmeans_converges_on_separated_clusters(spark):
    from reactivedb_spark.operators.similarity import kmeans_assignments

    # two tight blobs far apart; seeds (2 lowest ids) start one per blob
    rows = [(0, [0.0, 0.0]), (2, [0.1, 0.0]), (4, [0.0, 0.1]),
            (1, [5.0, 5.0]), (3, [5.1, 5.0]), (5, [5.0, 5.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r["cluster"]
           for r in kmeans_assignments(df, "vec_id", "embedding",
                                       k=2, iters=2).collect()}
    assert got[0] == got[2] == got[4] == 0
    assert got[1] == got[3] == got[5] == 1


def test_kmeans_empty_cluster_keeps_seed_centroid(spark):
    from reactivedb_spark.operators.similarity import kmeans_assignments

    # seed 1 (vec 1) is nearer seed 0's blob than to anything else, so
    # cluster 1 empties after iteration 1 — its centroid must persist
    # (not NULL out) and the final assignment still covers every vector
    rows = [(0, [0.0, 0.0]), (1, [0.2, 0.0]), (2, [0.1, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_assignments(df, "vec_id", "embedding", k=2, iters=2).collect()
    assert len(out) == 3
    assert all(r["cluster"] in (0, 1) and r["d2"] is not None for r in out)


def test_kmeans_partition_order_invariance(spark):
    from reactivedb_spark.operators.similarity import kmeans_assignments

    df = spark.range(60).selectExpr(
        "id AS vec_id",
        "array(cast(hash(id, 1) % 100 as float) / 100.0,"
        "      cast(hash(id, 2) % 100 as float) / 100.0) AS embedding",
    )
    a = sorted(map(tuple, kmeans_assignments(
        df, "vec_id", "embedding", k=4, iters=2).collect()))
    b = sorted(map(tuple, kmeans_assignments(
        df.repartition(13), "vec_id", "embedding", k=4, iters=2).collect()))
    assert a == b


# -- ks_pairs -------------------------------------------------------------------

def test_ks_known_values(spark):
    from reactivedb_spark.operators.numeric import ks_pairs

    # a = {1,2,3}, b = {4,5,6}: fully separated -> KS = 1
    # a = {1,2,3}, c = {1,2,3}: identical -> KS = 0
    rows = ([("a", v) for v in (1, 2, 3)] + [("b", v) for v in (4, 5, 6)]
            + [("c", v) for v in (1, 2, 3)])
    df = spark.createDataFrame(rows, "g string, x long")
    got = {(r["s1"], r["s2"]): r["ks"] for r in ks_pairs(df, "g", "x").collect()}
    assert got[("a", "b")] == 1.0
    assert got[("a", "c")] == 0.0
    # a={1,2,3,4} vs d={3,4,5,6}: max gap at x=2 -> |2/4 - 0/4| = 0.5
    rows = [("a", v) for v in (1, 2, 3, 4)] + [("d", v) for v in (3, 4, 5, 6)]
    df = spark.createDataFrame(rows, "g string, x long")
    [r] = ks_pairs(df, "g", "x").collect()
    assert (r["s1"], r["s2"], r["ks"]) == ("a", "d", 0.5)


def test_ks_ties_within_and_across_groups(spark):
    from reactivedb_spark.operators.numeric import ks_pairs

    # ECDF is right-continuous: at a tied value both groups' counts
    # advance together before the gap is read (RANGE frame peers)
    rows = [("a", 1), ("a", 1), ("b", 1), ("b", 2)]
    df = spark.createDataFrame(rows, "g string, x long")
    [r] = ks_pairs(df, "g", "x").collect()
    # at x=1: F_a=1, F_b=0.5 -> gap 0.5; at x=2 both 1 -> KS = 0.5
    assert r["ks"] == 0.5


def test_ks_no_nested_loop_join(spark):
    from reactivedb_spark.operators.numeric import ks_pairs

    df = spark.createDataFrame(
        [("g%d" % (i % 4), i) for i in range(40)], "g string, x long")
    plan = _plan(ks_pairs(df, "g", "x"))
    # the VALUE stream joins the pair relation via broadcast hash joins;
    # the only cross product is the group-SIZES self-join building the
    # p(p-1)/2 pairs (bounded by group count, never by rows)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" not in plan


# -- corr_matrix ----------------------------------------------------------------

def test_corr_known_values_and_guards(spark):
    import pytest as _pytest

    from reactivedb_spark.operators.regression import corr_matrix

    df = spark.createDataFrame(
        [(1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 5.0), (3.0, 6.0, -3.0, 5.0)],
        "a double, b double, c double, d double",
    )
    got = {(r["col_a"], r["col_b"]): r["corr"]
           for r in corr_matrix(df, ["a", "b", "c", "d"]).collect()}
    assert got[("a", "b")] == _pytest.approx(1.0)    # b = 2a
    assert got[("a", "c")] == _pytest.approx(-1.0)   # c = -a
    assert got[("a", "d")] is None                   # d constant
    assert len(got) == 6
    with _pytest.raises(ValueError):
        corr_matrix(df, ["a"])


def test_corr_single_aggregation(spark):
    from reactivedb_spark.operators.regression import corr_matrix

    df = spark.range(200).selectExpr(
        "cast(id as double) a", "cast(id * id as double) b",
        "cast(id % 7 as double) c")
    plan = _plan(corr_matrix(df, ["a", "b", "c"]))
    assert "Join" not in plan and plan.count("Exchange") == 1


# -- bpe_encode -----------------------------------------------------------------

def test_bpe_encode_counts_match_manual_merge(spark):
    """Tiny corpus with a known merge sequence: 'ab' dominates, so after
    one merge 'abab' is 2 symbols and 'abc' is 2 — the per-doc counts
    must equal the hand-computed tokenization."""
    from reactivedb_spark.operators.bpe import bpe_encode

    docs = _docs(spark, [
        (1, "abab abab"),   # each word: a b a b -> (ab) (ab) -> (abab)...
        (2, "abc"),
        (3, ""),            # tokenless: no row
    ])
    got = {r["doc_id"]: r["n_tokens"]
           for r in bpe_encode(docs, "doc_id", "text", merges=2).collect()}
    # merge 1: ('a','b') count 5 -> 'ab'; merge 2: ('ab','ab') count 2
    # (ties: ('ab','c') count 1) -> 'abab'
    # doc 1: two words 'abab' -> 1 symbol each = 2; doc 2: 'ab','c' = 2
    assert got == {1: 2, 2: 2}


def test_bpe_encode_total_consistency_with_training_relation(spark):
    """Σ per-doc tokens must equal Σ word-count × per-word symbols —
    the encode join may not duplicate or drop occurrences."""
    from reactivedb_spark.operators.bpe import bpe_encode

    docs = _docs(spark, [
        (1, "aa bb aa"), (2, "bb aa bb cc"), (3, "cc aa"),
    ])
    enc = bpe_encode(docs, "doc_id", "text", merges=1).collect()
    total = sum(r["n_tokens"] for r in enc)
    # merge 1 is ('a','a') (count 4 beats ('b','b') 3 by count): words
    # aa->1 symbol, bb->2, cc->2. Occurrences: aa x4, bb x3, cc x2
    assert total == 4 * 1 + 3 * 2 + 2 * 2
