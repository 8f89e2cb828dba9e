"""Interpolated bigram LM scoring (operators/lm.py): hand-computed
small-corpus check + structural properties."""

import math

import pytest

from reactivedb_spark.operators.lm import bigram_logprob


def test_hand_computed_two_doc_corpus(spark):
    # corpus: d1 = "a b a", d2 = "b a"
    # unigrams: a:3 b:2, N=5
    # pairs: d1: (a,b),(b,a); d2: (b,a)
    # c_big: (a,b):1 (b,a):2 ; c_ctx: a:1 b:2
    df = spark.createDataFrame([(1, "a b a"), (2, "b a")],
                               "doc_id long, text string")
    lam = 0.75
    p_ab = lam * (1 / 1) + (1 - lam) * (2 / 5)   # w2=b: c_uni=2
    p_ba = lam * (2 / 2) + (1 - lam) * (3 / 5)   # w2=a: c_uni=3
    exp = {
        1: (2, round(math.log(p_ab) + math.log(p_ba), 6)),
        2: (1, round(math.log(p_ba), 6)),
    }
    got = {r["doc_id"]: (r["n_bigrams"], r["logprob"])
           for r in bigram_logprob(df, "doc_id", "text").collect()}
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert got[k][1] == pytest.approx(exp[k][1], abs=2e-6)


def test_single_token_docs_carry_no_row(spark):
    df = spark.createDataFrame([(1, "solo"), (2, "two words")],
                               "doc_id long, text string")
    got = {r["doc_id"] for r in bigram_logprob(df, "doc_id", "text").collect()}
    assert got == {2}


def test_logprob_is_nonpositive_and_repeated_text_scores_higher(spark):
    df = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "p q r s t u")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["logprob"] / r["n_bigrams"]
           for r in bigram_logprob(df, "doc_id", "text").collect()}
    assert all(v <= 0 for v in got.values())
    # the repetitive doc's bigrams are all high-probability
    assert got[1] > got[2]
