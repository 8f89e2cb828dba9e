"""Round-13 query additions (VERDICT r12 #3): trigram_search_bounded,
the df-bounded production twin — identical result set to the research
twin with posting lists capped by rarest-first selection."""

import pytest

from reactivedb_spark.operators.retrieval import trigram_search, trigram_search_bounded

DOCS = [
    (1, "the quick brown fox"),
    (2, "quick brownies for the win"),
    (3, "brow nquick"),
    (4, "xxx quick brown xxx"),
    (5, None),
    (6, "the the the the"),            # high-df trigrams only
    (7, "fox quick the brown"),        # all words, no contiguous phrase
]
PATTERNS = ["quick brown", "the ", "own fox"]


def test_bounded_matches_research_twin_exactly(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    want = {(r.pattern, r.doc_id)
            for r in trigram_search(df, "doc_id", "text", PATTERNS).collect()}
    for probe_k in (1, 2, 100):  # any probe budget: same exact result
        got = {(r.pattern, r.doc_id)
               for r in trigram_search_bounded(
                   df, "doc_id", "text", PATTERNS,
                   probe_k=probe_k, sample_mod=2).collect()}
        assert got == want, probe_k


def test_bounded_sample_quality_never_affects_results(spark):
    # sample_mod so large the df sample is (near-)empty: choice of probed
    # trigrams degrades to lexicographic, results must not change
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    want = {(r.pattern, r.doc_id)
            for r in trigram_search(df, "doc_id", "text", PATTERNS).collect()}
    got = {(r.pattern, r.doc_id)
           for r in trigram_search_bounded(
               df, "doc_id", "text", PATTERNS,
               probe_k=2, sample_mod=10**6).collect()}
    assert got == want


def test_bounded_validation(spark):
    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        trigram_search_bounded(df, "doc_id", "text", ["ab"])
    with pytest.raises(ValueError):
        trigram_search_bounded(df, "doc_id", "text", ["abc"], probe_k=0)
    with pytest.raises(ValueError):
        trigram_search_bounded(df, "doc_id", "text", [])
