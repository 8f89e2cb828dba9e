"""DSIR importance weighting (operators/importance.py) and length
bucketing (operators/packing.py:length_buckets) unit tests."""

from pyspark.sql import functions as F

from reactivedb_spark.operators.importance import dsir_log_weights
from reactivedb_spark.operators.packing import length_buckets


def test_dsir_separates_target_from_offtarget(spark):
    # target docs speak 'aa bb', off-target docs speak 'xx yy'. Token
    # counts must exceed the Laplace mass (n_buckets) or smoothing
    # flattens both multinomials toward 1/B — the documented
    # tiny-corpus regime, not a defect — so each doc repeats 20x.
    rows = [
        (1, "aa bb aa bb aa " * 20, True),
        (2, "bb aa bb aa " * 20, True),
        (3, "xx yy xx yy xx yy " * 20, False),
        (4, "aa bb aa " * 20, False),  # off-target doc with target vocab
        (5, "xx yy " * 20, False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    got = {r.doc_id: r for r in
           dsir_log_weights(df, "doc_id", "text", F.col("is_t"),
                            n_buckets=64).collect()}
    assert got[1].n_tokens == 100 and got[3].n_tokens == 120
    # target-vocab docs score ABOVE off-target-vocab docs, regardless of
    # which subset they sit in (content drives the weight, not the flag)
    assert got[1].log_w > 0 and got[2].log_w > 0
    assert got[4].log_w > 0          # looks like the target -> selected
    assert got[3].log_w < 0 and got[5].log_w < 0


def test_dsir_empty_and_blank_docs_carry_no_row(spark):
    df = spark.createDataFrame(
        [(1, "aa bb", True), (2, "", False), (3, "   ", False)],
        "doc_id long, text string, is_t boolean")
    got = {r.doc_id for r in
           dsir_log_weights(df, "doc_id", "text", F.col("is_t")).collect()}
    assert got == {1}


def test_length_buckets_exact_waste(spark):
    # one stratum, 8 docs of lengths 1..8, k=2: bucket 1 = lengths
    # 1-4 (max 4, total 10), bucket 2 = lengths 5-8 (max 8, total 26)
    rows = [(i, "s", " ".join(["w"] * i)) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    got = {r.bucket: r for r in
           length_buckets(df, "doc_id", "src", "text", k=2).collect()}
    b1, b2 = got[1], got[2]
    assert (b1.n_docs, b1.total_tokens, b1.max_tokens) == (4, 10, 4)
    assert (b2.n_docs, b2.total_tokens, b2.max_tokens) == (4, 26, 8)
    assert b1.waste_ppm == (4 * 4 - 10) * 1_000_000 // (4 * 4)  # 375000
    assert b2.waste_ppm == (8 * 4 - 26) * 1_000_000 // (8 * 4)  # 187500


def test_length_buckets_ties_pinned_by_id(spark):
    # equal lengths: ntile ties break by doc_id, so the split point is
    # deterministic (docs 1..4 -> bucket 1, docs 5..8 -> bucket 2)
    rows = [(i, "s", "w w w") for i in range(1, 9)]
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    out = length_buckets(df, "doc_id", "src", "text", k=2).collect()
    assert {(r.bucket, r.n_docs) for r in out} == {(1, 4), (2, 4)}
    assert all(r.waste_ppm == 0 for r in out)  # no padding among equals


def test_length_buckets_strata_are_independent(spark):
    rows = ([(i, "a", " ".join(["w"] * i)) for i in range(1, 5)]
            + [(10 + i, "b", " ".join(["w"] * (10 * i))) for i in range(1, 5)])
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    out = length_buckets(df, "doc_id", "src", "text", k=2).collect()
    by = {(r.stratum, r.bucket): r for r in out}
    assert by[("a", 2)].max_tokens == 4
    assert by[("b", 2)].max_tokens == 40
