"""Dedup operator units that don't need the documents fixture."""

from pyspark.sql import functions as F

from reactivedb_spark.operators import dedup


def test_simhash_banded_pairs_exact_vs_bruteforce(spark):
    """The banded (pigeonhole) Hamming join must return exactly the
    brute-force all-pairs answer — banding is a candidate generator, not
    an approximation."""
    # 60 clusters of 5: members share a base signature with ≤2 bits
    # flipped (near dups, hamming ≤ 4 in-cluster) while distinct clusters
    # are far apart — exercises both accept and reject paths.
    # clusters of 5 sharing a base signature with bits flipped, PLUS exact
    # duplicate signatures (id >= 250 repeats an earlier doc's signature) —
    # exercises the banded path, the identity (hamming 0) path, and rejects
    sig = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "CASE WHEN id >= 250 THEN CAST((((id - 250) div 5) * 2654435761) % 4294967296 AS BIGINT) ELSE "
            "CAST(((id div 5) * 2654435761) % 4294967296 AS BIGINT) "
            "^ CASE WHEN id % 5 = 0 THEN 0 ELSE shiftleft(1, CAST(id % 31 AS INT)) END "
            "^ CASE WHEN id % 5 > 2 THEN shiftleft(1, CAST((id * 7) % 31 AS INT)) ELSE 0 END END"
        ).alias("simhash"),
    )
    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup.simhash_pairs(sig, max_hamming=6).collect()
    }
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    brute = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
        )
        .filter(F.col("hamming") <= 6)
        .select("doc_a", "doc_b", "hamming")
        .collect()
    }
    assert banded == brute and len(brute) > 0


def test_simhash_banded_pairs_no_cartesian_plan(spark):
    sig = spark.range(50).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7919).alias("simhash")
    )
    plan = dedup.simhash_pairs(sig)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def _mini_corpus(spark):
    """60 docs over a 8-token vocab with many duplicate token SETS (and
    docs whose texts differ but sets coincide), plus token-less docs."""
    rows = []
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    for i in range(60):
        k = i % 6
        toks = vocab[k: k + 3] + ([vocab[0]] if i % 4 == 0 else [])
        # repeat tokens in varying order: same SET, different text
        text = " ".join(toks * (1 + i % 3)) if i % 7 else ""
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _naive_lsh(spark, df):
    """Reference implementation: per-doc band join, no set collapse."""
    from pyspark.sql import functions as F

    tok = dedup.tokens(df, "doc_id", "text", distinct=False)
    sigs = tok.groupBy("doc_id").agg(
        *[F.min(F.md5(F.concat(F.lit(f"s{i}_"), F.col("token")))).alias(f"mh{i}")
          for i in range(1, dedup.MINHASH_K + 1)]
    )
    banded = dedup.lsh_bands(sigs, "doc_id")
    pairs = None
    for b in range(1, dedup.LSH_BANDS + 1):
        a = banded.select(F.col("doc_id").alias("doc_a"), F.col(f"band{b}").alias("bk"))
        c = banded.select(F.col("doc_id").alias("doc_b"), F.col(f"band{b}").alias("bk"))
        p = a.join(c, "bk").filter(F.col("doc_a") < F.col("doc_b")).select("doc_a", "doc_b")
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()


def test_lsh_candidates_equals_naive_per_band_joins(spark):
    df = _mini_corpus(spark)
    got = {(r.doc_a, r.doc_b) for r in dedup.lsh_candidates(df, "doc_id", "text").collect()}
    want = {(r.doc_a, r.doc_b) for r in _naive_lsh(spark, df).collect()}
    assert got == want and len(want) > 50


def test_jaccard_equals_naive_set_math(spark):
    from pyspark.sql import functions as F

    df = _mini_corpus(spark)
    got = {(r.doc_a, r.doc_b): r.jaccard
           for r in dedup.jaccard_pairs(df, "doc_id", "text").collect()}
    # naive: exact jaccard over naive candidates via collected token sets
    tok = dedup.tokens(df, "doc_id", "text", distinct=True)
    sets = {r.doc_id: set(r.toks) for r in
            tok.groupBy("doc_id").agg(F.collect_set("token").alias("toks")).collect()}
    want = {}
    for (a, b) in {(r.doc_a, r.doc_b) for r in _naive_lsh(spark, df).collect()}:
        inter = len(sets[a] & sets[b])
        if inter:
            want[(a, b)] = inter / len(sets[a] | sets[b])
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k
    # threshold path: identity (set-identical) pairs survive any t <= 1
    thr = {(r.doc_a, r.doc_b) for r in
           dedup.jaccard_pairs(df, "doc_id", "text", threshold=0.999).collect()}
    assert thr == {k for k, v in want.items() if v >= 0.999} and len(thr) > 0


def test_simhash_matches_direct_per_doc_computation(spark):
    from pyspark.sql import functions as F

    df = _mini_corpus(spark)
    got = {r.doc_id: r.simhash for r in dedup.simhash(df, "doc_id", "text").collect()}
    # docs with identical token sets must share signatures; spot-check one
    # signature against a direct per-doc computation
    tok = dedup.tokens(df, "doc_id", "text", distinct=True)
    one = tok.filter(F.col("doc_id") == 1)
    import hashlib
    toks = [r.token for r in one.collect()]
    sig = 0
    for j in range(32):
        vote = sum(1 if hashlib.md5(t.encode()).hexdigest()[j] in "89abcdef" else -1
                   for t in toks)
        if vote > 0:
            sig |= 1 << j
    assert got[1] == sig
    # empty-text docs (i % 7 == 0) have no tokens → no signature row
    assert 0 not in got and 7 not in got


def test_jaccard_non_broadcast_path_matches_broadcast(spark):
    """Above the size gate the per-doc set side must NOT be broadcast (it
    is corpus-sized); the shuffle-join plan must produce identical values.
    autoBroadcastJoinThreshold is disabled so Catalyst cannot silently
    re-broadcast from its own stats and mask a wrong gate."""
    df = _mini_corpus(spark)
    want = {(r.doc_a, r.doc_b): r.jaccard
            for r in dedup.jaccard_pairs(df, "doc_id", "text",
                                         broadcast_sets=True).collect()}
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = dedup.jaccard_pairs(df, "doc_id", "text", broadcast_sets=False)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the only broadcasts left are the vocab-sized token dictionary
        # inside _token_bitsets (intended, one per set side); both
        # corpus-sized doc-set joins must be shuffle joins
        assert "BroadcastHashJoin [doc_" not in plan, plan
        assert "SortMergeJoin [doc_a" in plan and "SortMergeJoin [doc_b" in plan, plan
        got = {(r.doc_a, r.doc_b): r.jaccard for r in out.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == want and len(want) > 0


def test_jaccard_auto_gate_counts_docs_and_broadcasts_small(spark):
    """broadcast_sets=None on a small corpus resolves to the broadcast
    plan (estimate under BROADCAST_SETS_LIMIT)."""
    df = _mini_corpus(spark)
    out = dedup.jaccard_pairs(df, "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # and a forced-huge estimate flips the gate off
    out2 = dedup.jaccard_pairs(df, "doc_id", "text",
                               n_docs=10**9, broadcast_sets=None)
    assert {(r.doc_a, r.doc_b) for r in out2.collect()} == \
           {(r.doc_a, r.doc_b) for r in out.collect()}


def test_lsh_stop_band_guard_drops_degenerate_bucket(spark):
    """1k docs sharing one band key (identical boilerplate) would emit
    ~500k pairs from a single reducer; with max_bucket the bucket is
    excluded while small buckets keep their pairs."""
    rows = [(i, "common boilerplate header text") for i in range(1000)]
    rows += [(2000, "alpha beta gamma"), (2001, "alpha beta gamma")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    guarded = dedup.lsh_candidates(df, "doc_id", "text", max_bucket=50)
    pairs = {(r.doc_a, r.doc_b) for r in guarded.collect()}
    # the two identical small docs share every band (bucket size 2 <= cap)
    assert pairs == {(2000, 2001)}

    # guard off: the degenerate bucket really is quadratic-sized
    unguarded = dedup.lsh_candidates(df.filter("doc_id < 100"), "doc_id", "text")
    assert unguarded.count() == 100 * 99 // 2

    # jaccard_pairs forwards the guard
    jp = dedup.jaccard_pairs(df, "doc_id", "text", max_bucket=50)
    assert {(r.doc_a, r.doc_b) for r in jp.collect()} == {(2000, 2001)}


def test_sampling_deterministic_and_stratified(spark):
    """hash_sample: repartition-proof row subset; stratified_sample:
    exactly n per stratum, stable across runs."""
    from reactivedb_spark.operators.sampling import hash_sample, stratified_sample

    df = spark.createDataFrame(
        [(i, "abc"[i % 3]) for i in range(300)], "doc_id long, lang string"
    )
    s1 = {r.doc_id for r in hash_sample(df, "doc_id", 20).collect()}
    s2 = {r.doc_id for r in hash_sample(df.repartition(7), "doc_id", 20).collect()}
    assert s1 == s2 and 0 < len(s1) < 300
    # same hash family as the SQL oracle: md5-prefix int
    import hashlib

    expect = {i for i in range(300)
              if int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 100 < 20}
    assert s1 == expect

    st = stratified_sample(df, "doc_id", "lang", 10)
    per = {}
    for r in st.collect():
        per.setdefault(r.lang, set()).add(r.doc_id)
    assert {k: len(v) for k, v in per.items()} == {"a": 10, "b": 10, "c": 10}
    st2 = stratified_sample(df.repartition(5), "doc_id", "lang", 10)
    assert {(r.doc_id, r.lang) for r in st2.collect()} == \
           {(r.doc_id, r.lang) for r in st.collect()}


def test_simhash2_pairs_exact_vs_bruteforce(spark):
    """64-bit split-signature banding (the scale-correct layout) must
    also return exactly the brute-force answer within the Hamming
    budget — including pairs whose halves individually exceed it."""
    sig = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "CAST(((id div 5) * 2654435761) % 4294967296 AS BIGINT) "
            "^ CASE WHEN id % 5 = 0 THEN 0 ELSE shiftleft(1, CAST(id % 31 AS INT)) END"
        ).alias("sh_hi"),
        F.expr(
            "CAST(((id div 5) * 40503) % 4294967296 AS BIGINT) "
            "^ CASE WHEN id % 5 > 2 THEN shiftleft(1, CAST((id * 3) % 31 AS INT)) ELSE 0 END"
        ).alias("sh_lo"),
    )
    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup.simhash2_pairs(sig, max_hamming=3).collect()
    }
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("sh_hi").alias("hha"),
                   F.col("sh_lo").alias("hla"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("sh_hi").alias("hhb"),
                   F.col("sh_lo").alias("hlb"))
    ham = (
        F.bit_count(F.col("hha").bitwiseXOR(F.col("hhb")))
        + F.bit_count(F.col("hla").bitwiseXOR(F.col("hlb")))
    ).cast("long")
    brute = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
        .collect()
    }
    assert banded == brute and len(brute) > 0


def test_simhash2_hi_half_matches_simhash(spark):
    """sh_hi votes on the same hex-high-bit criterion as the 32-bit
    simhash, so the halves agree doc for doc."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta eps"), (3, "alpha beta gamma")],
        "doc_id: long, text: string",
    )
    narrow = {r.doc_id: r.simhash for r in dedup.simhash(df, "doc_id", "text").collect()}
    wide = {r.doc_id: (r.sh_hi, r.sh_lo)
            for r in dedup.simhash2(df, "doc_id", "text").collect()}
    assert {k: v[0] for k, v in wide.items()} == narrow
    assert wide[1] == wide[3]  # identical docs → identical 64-bit sigs
    assert all(0 <= hi < 2**32 and 0 <= lo < 2**32 for hi, lo in wide.values())


def test_simhash2_pairs_no_cartesian_plan(spark):
    sig = spark.range(50).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 7919).alias("sh_hi"),
        (F.col("id") * 104729).alias("sh_lo"),
    )
    plan = dedup.simhash2_pairs(sig)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_containment_prefix_pairs_full_recall_vs_bruteforce(spark):
    """The prefix-filter guarantee is algebraic: the banded output must
    equal the brute-force all-pairs containment join exactly — including
    the asymmetric tiny-doc-inside-huge-doc pairs MinHash-LSH misses."""
    vocab = [f"w{i:03d}" for i in range(120)]
    rows = []
    # a huge doc, tiny docs fully contained in it (containment 1.0 at
    # wildly different sizes), near-subsets, and clear rejects
    rows.append((0, " ".join(vocab[:100])))
    rows.append((1, " ".join(vocab[:5])))        # tiny ⊂ huge
    rows.append((2, " ".join(vocab[40:52])))     # 12 tokens ⊂ huge
    rows.append((3, " ".join(vocab[:8] + vocab[110:112])))  # 8/10 in huge
    rows.append((4, " ".join(vocab[100:120])))   # disjoint-ish
    for i in range(5, 40):
        rows.append((i, " ".join(vocab[i: i + 7])))
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        (r.doc_a, r.doc_b): round(r.containment, 9)
        for r in dedup.containment_prefix_pairs(df, "doc_id", "text", 4, 5).collect()
    }
    tok = dedup.tokens(df, "doc_id", "text")
    sets = tok.groupBy("doc_id").agg(
        F.collect_set("token").alias("toks"), F.count("*").alias("n")
    )
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"),
                    F.col("n").alias("na"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"),
                    F.col("n").alias("nb"))
    brute = {
        (r.doc_a, r.doc_b): round(r.c, 9)
        for r in a.crossJoin(b).filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("ni", F.size(F.array_intersect("ta", "tb")))
        .filter(F.lit(5) * F.col("ni") >= F.lit(4) * F.least("na", "nb"))
        .withColumn("c", F.col("ni") / F.least("na", "nb"))
        .select("doc_a", "doc_b", "c").collect()
    }
    assert got == brute
    assert got[(0, 1)] == 1.0 and got[(0, 2)] == 1.0  # asymmetric recall
    assert got[(0, 3)] == 0.8
    assert (0, 4) not in got


def test_containment_prefix_pairs_rejects_bad_threshold(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id: long, text: string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup.containment_prefix_pairs(df, "doc_id", "text", 6, 5)
    with _pytest.raises(ValueError):
        dedup.containment_prefix_pairs(df, "doc_id", "text", 0, 5)


def test_simhash2_pairs_rejects_unbandable_hamming(spark):
    sig = spark.range(4).select(
        F.col("id").alias("doc_id"),
        F.col("id").alias("sh_hi"), F.col("id").alias("sh_lo"),
    )
    import pytest as _pytest

    for bad in (0, 2, 5, 63):
        with _pytest.raises(ValueError, match="max_hamming"):
            dedup.simhash2_pairs(sig, max_hamming=bad)


def test_containment_prefix_guard_keeps_pairs_with_shared_nonstop_tokens(spark):
    """max_token_docs drops stop-tokens from candidate generation, but
    the prefix-length bound stays on the FULL set size, so a pair whose
    shared tokens are only PARTLY stop-tokens is still found."""
    # stop tokens s0..s4 appear in many docs (df > cap); doc 0 and doc 1
    # share all 5 stop tokens AND 3 of doc 0's 5 rare tokens:
    # containment(0,1) = 8/10 = 0.8 — qualifies at 4/5
    stop = [f"s{i}" for i in range(5)]
    rows = [
        (0, " ".join(stop + ["r0", "r1", "r2", "r3", "r4"])),
        (1, " ".join(stop + ["r0", "r1", "r2", "x0", "x1", "x2", "x3"])),
    ]
    for i in range(2, 12):  # inflate stop-token document frequency
        rows.append((i, " ".join(stop + [f"u{i}a", f"u{i}b", f"u{i}c",
                                         f"u{i}d", f"u{i}e", f"u{i}f"])))
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.containment_prefix_pairs(
            df, "doc_id", "text", 4, 5, max_token_docs=5
        ).collect()
    }
    assert (0, 1) in got
