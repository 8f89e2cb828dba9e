"""Benchmark decontamination: n-gram overlap semantics."""

from pyspark.sql import functions as F

from reactivedb_spark.operators.contamination import ngram_overlap, ngrams_expr


def test_ngrams_expr_counts_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "")], "id long, t string"
    )
    got = {r.id: r.n for r in df.select(
        "id", F.size(ngrams_expr(F.col("t"), 3)).alias("n")).collect()}
    # 4 tokens -> 2 trigrams; under 3 tokens -> empty (not a descending
    # sequence artifact)
    assert got == {1: 2, 2: 0, 3: 0}


def test_overlap_flags_only_true_matches(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # contains bench 5-gram
            (2, "completely unrelated text with no shared phrases at all"),
            (3, "short doc"),  # < 5 tokens: 0 n-grams, clean
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over me")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in
            ngram_overlap(corpus, bench, "doc_id", "text", n=5).collect()}
    assert rows[1].contaminated == 1 and rows[1].n_hits == 1
    assert rows[2].contaminated == 0 and rows[2].n_hits == 0
    assert rows[3].contaminated == 0 and rows[3].n_ngrams == 0
    # n_ngrams: 9 tokens -> 5 five-grams, all distinct
    assert rows[1].n_ngrams == 5


def test_repeated_ngram_counts_once(spark):
    # doc repeats the contaminated 5-gram twice; n_hits is DISTINCT grams
    corpus = spark.createDataFrame(
        [(1, "a b c d e x a b c d e")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    r = ngram_overlap(corpus, bench, "doc_id", "text", n=5).collect()[0]
    assert r.n_hits == 1 and r.contaminated == 1
