"""Broadcast size-gates: no corpus-derived relation may be broadcast
unconditionally. (The dedup.jaccard_pairs gate is covered in
test_dedup_ops.py; this file covers the remaining gated sites.)"""

from reactivedb_spark.suite.analytics import q_unigram_logprob


def test_unigram_vocab_gate_non_broadcast_matches(spark, sf_dir):
    """Above the gate the vocabulary join must be a shuffle join (the
    vocab is corpus-sized at web scale) and values must be identical to
    the broadcast plan. autoBroadcastJoinThreshold is disabled so
    Catalyst cannot silently re-broadcast from stats and mask the gate."""
    want = {r["doc_id"]: (r["n_tokens"], r["logprob"])
            for r in q_unigram_logprob(spark, sf_dir, broadcast_vocab=True).collect()}
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = q_unigram_logprob(spark, sf_dir, broadcast_vocab=False)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan
        got = {r["doc_id"]: (r["n_tokens"], r["logprob"]) for r in out.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == want and len(want) > 0


def test_broadcast_if_small_gates_on_file_size(spark, sf_dir):
    from reactivedb_spark import stats

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    hinted = stats.broadcast_if_small(c)
    # small fixture → hint applied (plan object differs from input)
    assert hinted._jdf is not c._jdf
    # a 1-byte limit → too big → returned unhinted
    assert stats.broadcast_if_small(c, limit=1)._jdf is c._jdf


def test_broadcast_if_small_unknown_source_not_hinted(spark):
    from reactivedb_spark import stats

    df = spark.range(10)  # no backing files
    assert stats.broadcast_if_small(df)._jdf is df._jdf
