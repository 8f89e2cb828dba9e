"""Unit tests: portable HLL sketch (operators/sketch.py) and banded
range join (operators/rangejoin.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from reactivedb_spark.operators import rangejoin, sketch


def test_hll_accuracy_raw_regime(spark):
    # 5000 distinct values >> 2.5*m=640 → raw estimator path
    df = spark.range(5000).select(F.col("id").alias("v"), F.lit("g").alias("g"))
    row = sketch.hll_distinct(df, ["g"], "v").collect()[0]
    assert abs(row["est"] - 5000) / 5000 < 0.15  # ~2σ of 1.04/sqrt(256)


def test_hll_accuracy_linear_regime(spark):
    # 100 distinct « m → linear-counting correction path
    df = spark.range(100).select(F.col("id").alias("v"), F.lit("g").alias("g"))
    row = sketch.hll_distinct(df, ["g"], "v").collect()[0]
    assert abs(row["est"] - 100) <= 10


def test_hll_duplicates_dont_move_estimate(spark):
    base = spark.range(1000).select(F.col("id").alias("v"), F.lit("g").alias("g"))
    dup = base.unionAll(base).unionAll(base)
    a = sketch.hll_distinct(base, ["g"], "v").collect()[0]
    b = sketch.hll_distinct(dup, ["g"], "v").collect()[0]
    assert a["est"] == b["est"] and a["sum_nonzero"] == b["sum_nonzero"]


def test_hll_sketch_merge(spark):
    """Register tables are mergeable: union + re-max == sketch of union."""
    left = spark.range(0, 3000).select(F.col("id").alias("v"), F.lit("g").alias("g"))
    right = spark.range(2000, 6000).select(F.col("id").alias("v"), F.lit("g").alias("g"))
    merged_regs = (
        sketch.hll_sketch(left, ["g"], "v")
        .unionByName(sketch.hll_sketch(right, ["g"], "v"))
        .groupBy("g", "bucket").agg(F.max("rho").alias("rho"))
    )
    direct = sketch.hll_estimate(
        sketch.hll_sketch(left.unionAll(right), ["g"], "v"), ["g"]
    ).collect()[0]
    via_merge = sketch.hll_estimate(merged_regs, ["g"]).collect()[0]
    assert direct == via_merge


def _ev(spark, rows):
    return spark.createDataFrame(rows, "k string, id long, t long")


def test_range_join_matches_naive(spark):
    import random

    rnd = random.Random(7)
    left = _ev(spark, [("k%d" % rnd.randrange(3), i, rnd.randrange(0, 1000)) for i in range(80)])
    right = _ev(spark, [("k%d" % rnd.randrange(3), 1000 + i, rnd.randrange(0, 1000)) for i in range(80)])
    lo, hi = -50, 120
    banded = rangejoin.range_join(
        left.withColumnRenamed("id", "lid").withColumnRenamed("t", "lt"),
        right.withColumnRenamed("id", "rid").withColumnRenamed("t", "rt"),
        on=["k"], left_time="lt", right_time="rt", lower=lo, upper=hi,
    ).select("lid", "rid")
    naive = (
        left.withColumnRenamed("id", "lid").withColumnRenamed("t", "lt")
        .join(right.withColumnRenamed("id", "rid").withColumnRenamed("t", "rt"), "k")
        .filter((F.col("rt") >= F.col("lt") + lo) & (F.col("rt") <= F.col("lt") + hi))
        .select("lid", "rid")
    )
    assert sorted(map(tuple, banded.collect())) == sorted(map(tuple, naive.collect()))


def test_range_join_hot_key_exact_once(spark):
    # one key owns every row — the banding must still emit each pair once
    left = _ev(spark, [("hot", i, i * 10) for i in range(50)])
    right = _ev(spark, [("hot", 100 + i, i * 10 + 5) for i in range(50)])
    out = rangejoin.range_join(
        left.withColumnRenamed("t", "lt"),
        right.withColumnRenamed("id", "rid").withColumnRenamed("t", "rt"),
        on=["k"], left_time="lt", right_time="rt", lower=0, upper=9,
    )
    rows = out.select("id", "rid").collect()
    assert len(rows) == len(set(map(tuple, rows))) == 50  # i matches i only


def test_range_join_left_keeps_unmatched(spark):
    left = _ev(spark, [("a", 1, 100), ("a", 2, 5000)])
    right = _ev(spark, [("a", 9, 101)])
    out = rangejoin.range_join(
        left.withColumnRenamed("t", "lt"),
        right.withColumnRenamed("id", "rid").withColumnRenamed("t", "rt"),
        on=["k"], left_time="lt", right_time="rt", lower=0, upper=10, how="left",
    )
    got = {(r["id"], r["rid"]) for r in out.collect()}
    assert got == {(1, 9), (2, None)}


def test_range_join_left_duplicate_rows_kept(spark):
    # two IDENTICAL unmatched left rows must both survive the add-back,
    # and two identical matched rows must both emit their matches
    left = _ev(spark, [("a", 1, 5000), ("a", 1, 5000), ("a", 2, 100), ("a", 2, 100)])
    right = _ev(spark, [("a", 9, 101)])
    out = rangejoin.range_join(
        left.withColumnRenamed("t", "lt"),
        right.withColumnRenamed("id", "rid").withColumnRenamed("t", "rt"),
        on=["k"], left_time="lt", right_time="rt", lower=0, upper=10, how="left",
    )
    got = sorted((r["id"], r["rid"]) for r in out.collect())
    assert got == [(1, None), (1, None), (2, 9), (2, 9)]


def test_range_join_left_null_columns_not_duplicated(spark):
    # a MATCHED left row containing a NULL column must not also be
    # re-emitted as unmatched (NULL = NULL is NULL under plain equality)
    left = spark.createDataFrame(
        [("a", None, 100), ("a", 7, 5000)], "k string, id long, lt long"
    )
    right = spark.createDataFrame([("a", 9, 101)], "k string, rid long, rt long")
    out = rangejoin.range_join(
        left, right, on=["k"], left_time="lt", right_time="rt",
        lower=0, upper=10, how="left",
    )
    got = sorted([(r["id"], r["rid"]) for r in out.collect()],
                 key=lambda p: (p[0] is None, p[0] or 0))
    assert got == [(7, None), (None, 9)]


def test_range_join_bucket_width_override(spark):
    left = _ev(spark, [("a", 1, 0), ("a", 2, 999)])
    right = _ev(spark, [("a", 9, 500)])
    for w in (10, 100, 5000):
        out = rangejoin.range_join(
            left.withColumnRenamed("t", "lt"),
            right.withColumnRenamed("id", "rid").withColumnRenamed("t", "rt"),
            on=["k"], left_time="lt", right_time="rt",
            lower=0, upper=600, bucket_width=w,
        )
        assert {(r["id"], r["rid"]) for r in out.collect()} == {(1, 9)}


def test_range_join_rejects_colliding_columns(spark):
    import pytest as _pytest

    left = _ev(spark, [("a", 1, 5)])
    right = _ev(spark, [("a", 2, 6)])  # same id/t names as left
    with _pytest.raises(ValueError, match="share non-key columns"):
        rangejoin.range_join(left, right, on=["k"], left_time="t",
                             right_time="t", lower=0, upper=10)


def test_bloom_no_false_negatives(spark):
    from reactivedb_spark.operators import bloom

    small = spark.range(500).select((F.col("id") * 13).alias("k"))
    words = bloom.build_bloom(small, "k", m_bits=1 << 12)
    hits = small.filter(bloom.bloom_might_contain(F.col("k"), words)).count()
    assert hits == 500  # every true member passes


def test_bloom_semi_join_exact(spark):
    from reactivedb_spark.operators import bloom

    small = spark.range(50).select((F.col("id") * 3).alias("k"))
    big = spark.range(5000).select((F.col("id") % 200).alias("k"), F.col("id").alias("v"))
    got = sorted(tuple(r) for r in bloom.bloom_semi_join(big, small, "k").collect())
    want = sorted(tuple(r) for r in big.join(small.distinct(), "k", "left_semi").collect())
    assert got == want


def test_bloom_unaligned_m_bits_no_false_negatives(spark):
    # m_bits not divisible by 64 must round up so build and probe share
    # one hash space (probe derives the modulus from len(words)*64)
    from reactivedb_spark.operators import bloom

    small = spark.range(300).select((F.col("id") * 7).alias("k"))
    words = bloom.build_bloom(small, "k", m_bits=100)  # → 128 bits
    assert len(words) == 2
    hits = small.filter(bloom.bloom_might_contain(F.col("k"), words)).count()
    assert hits == 300
    got = sorted(
        tuple(r)
        for r in bloom.bloom_semi_join(
            spark.range(2000).select(F.col("id").alias("k")), small, "k", m_bits=100
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in spark.range(2000).select(F.col("id").alias("k"))
        .join(small.distinct(), "k", "left_semi").collect()
    )
    assert got == want


def test_bloom_prunes_most_nonmembers(spark):
    from reactivedb_spark.operators import bloom

    small = spark.range(100).select(F.col("id").alias("k"))
    probe = spark.range(100, 10100).select(F.col("id").alias("k"))  # disjoint
    words = bloom.build_bloom(small, "k")  # 32768 bits, 100 keys
    fp = probe.filter(bloom.bloom_might_contain(F.col("k"), words)).count()
    assert fp < 100  # < 1% false positives at this density


def test_cms_overestimates_never_under(spark):
    """CMS point estimates are ≥ the true count, exact when no collision."""
    from reactivedb_spark.operators import sketch

    rows = [("a",)] * 50 + [("b",)] * 10 + [(f"x{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "v string")
    sk = sketch.cms_sketch(df, "v")
    est = {r["v"]: r["est"]
           for r in sketch.cms_estimate(sk, df.select("v").distinct(), "v").collect()}
    true = {"a": 50, "b": 10, **{f"x{i}": 1 for i in range(200)}}
    assert all(est[v] >= c for v, c in true.items())
    # heavy values are found regardless of collisions on the tail
    top = sketch.cms_topk(df, "v", k=2).collect()
    assert [r["v"] for r in top] == ["a", "b"]


def test_cms_topk_equals_sketch_path(spark):
    """cms_topk's word-count-weighted plan is byte-identical to the
    mergeable-sketch path it replaced (cms_sketch over the multiplicity
    stream + cms_estimate over the distinct probes) — full ranking, all
    distinct values, collisions and all."""
    from pyspark.sql import functions as F

    from reactivedb_spark.operators import sketch

    df = spark.range(4000).select(
        F.concat(F.lit("w"), (F.col("id") % 259) * (F.col("id") % 7)).alias("v"))
    n_distinct = df.select("v").distinct().count()
    got = sketch.cms_topk(df, "v", k=n_distinct).collect()
    sk = sketch.cms_sketch(df, "v")
    want = (
        sketch.cms_estimate(sk, df.select("v").distinct(), "v")
        .orderBy(F.col("est").desc(), F.col("v")).limit(n_distinct).collect()
    )
    assert list(map(tuple, got)) == list(map(tuple, want)) and len(got) == n_distinct


def test_cms_cells_merge_by_sum(spark):
    """Sketch of a union == (row,pos)-summed union of sketches."""
    from pyspark.sql import functions as F

    from reactivedb_spark.operators import sketch

    left = spark.range(500).select(F.concat(F.lit("t"), (F.col("id") % 37)).alias("v"))
    right = spark.range(300).select(F.concat(F.lit("t"), (F.col("id") % 11)).alias("v"))
    direct = sketch.cms_sketch(left.unionAll(right), "v")
    merged = (
        sketch.cms_sketch(left, "v").unionByName(sketch.cms_sketch(right, "v"))
        .groupBy("row", "pos").agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, merged.collect()))


def test_knn_join_matches_bruteforce_within_buckets(spark):
    """knn_join == per-vector top-k of the bucket-restricted brute force."""
    import itertools
    import math

    from reactivedb_spark.operators import similarity

    rows = [(i, [math.sin(i * 1.3 + d) for d in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["doc_a"], r["rank"]): r["doc_b"]
           for r in similarity.knn_join(df, "vec_id", "embedding", k=3).collect()}

    buckets = {r["vec_id"]: r["bucket"]
               for r in similarity.lsh_buckets(df, "vec_id", "embedding").collect()}
    pairs = {}
    for r in similarity.cosine_pairs(df, "vec_id", "embedding").collect():
        pairs[(r["doc_a"], r["doc_b"])] = r["cos_sim"]
        pairs[(r["doc_b"], r["doc_a"])] = r["cos_sim"]
    want = {}
    for a, b in itertools.permutations(buckets, 2):
        if buckets[a] == buckets[b]:
            cands = sorted(
                ((-pairs[(a, x)], x) for x in buckets
                 if x != a and buckets[x] == buckets[a]),
            )
            for rank, (_, x) in enumerate(cands[:3], start=1):
                want[(a, rank)] = x
    assert got == want and len(got) > 0


def test_knn_join_banded_equals_unbanded_below_band(spark):
    """With every bucket holding <= band+1 vectors, the banded production
    config is EXACTLY knn_join (the band covers the whole bucket — the
    small-sf identity the oracle-parity gate relies on)."""
    import math

    from reactivedb_spark.operators import similarity

    rows = [(i, [math.sin(i * 1.3 + d) for d in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    full = sorted(map(tuple, similarity.knn_join(
        df, "vec_id", "embedding", k=3).collect()))
    banded = sorted(map(tuple, similarity.knn_join_banded(
        df, "vec_id", "embedding", k=3, band=64).collect()))
    assert banded == full and len(banded) > 0


def test_banded_pairs_linear_bound_on_one_bucket(spark):
    """Adversarial skew: every vector in ONE bucket (same direction ⇒
    same projection signs). The unbanded candidate relation is n(n-1)/2;
    the banded one is capped at n·band by construction — and follows the
    (md5(id), id) band rule exactly."""
    import hashlib

    from pyspark.sql import functions as F

    from reactivedb_spark.operators import similarity

    n, band = 60, 4
    base = [0.31, -0.7, 0.22, 0.9, -0.11, 0.05, -0.4, 0.63]
    rows = [(i, [x * (1.0 + i) for x in base]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert similarity.lsh_buckets(
        df, "vec_id", "embedding").select("bucket").distinct().count() == 1

    got = {(r["doc_a"], r["doc_b"]) for r in similarity.banded_pairs(
        df, "vec_id", "embedding", band=band).collect()}
    assert len(got) <= n * band
    order = sorted(range(n), key=lambda i: (
        hashlib.md5(str(i).encode()).hexdigest(), i))
    want = {(order[p], order[q])
            for p in range(n) for q in range(p + 1, min(p + band + 1, n))}
    assert got == want
    # unbanded on the same data really is the quadratic relation
    assert similarity.cosine_pairs(
        df, "vec_id", "embedding").count() == n * (n - 1) // 2


def test_new_ops_plan_shapes(spark):
    """Physical-plan audit: knn_join's candidate generation is a bucket
    equi-join (never a cartesian), and cms_estimate probes a BROADCAST
    sketch (construction-bounded at d*w cells)."""
    import math

    from reactivedb_spark.operators import similarity, sketch

    rows = [(i, [math.sin(i * 1.3 + d) for d in range(8)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    knn_plan = similarity.knn_join(df, "vec_id", "embedding", k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in knn_plan
    assert "BroadcastNestedLoopJoin" not in knn_plan

    vals = spark.range(200).selectExpr("concat('t', id % 17) AS v")
    sk = sketch.cms_sketch(vals, "v")
    est_plan = sketch.cms_estimate(sk, vals.select("v").distinct(), "v") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in est_plan


def test_interval_join_exactly_once_and_edges(spark):
    """Pairs overlapping across MANY shared bands emit once (canonical
    band, no distinct); closed-interval edge touching counts; disjoint
    intervals don't."""
    from reactivedb_spark.operators.rangejoin import interval_join

    left = spark.createDataFrame(
        [(1, 0, 100), (1, 250, 260), (2, 0, 50)],
        "k long, ls long, le long")
    right = spark.createDataFrame(
        [(1, 40, 160), (1, 100, 110), (1, 260, 300), (2, 51, 60)],
        "k long, rs long, re long")
    out = interval_join(left, right, ["k"], "ls", "le", "rs", "re",
                        bucket_width=10)  # intervals span many bands
    got = sorted((r["k"], r["ls"], r["rs"]) for r in out.collect())
    # (1,[0,100])x(1,[40,160]): overlaps 7 shared bands -> ONE row
    # (1,[0,100])x(1,[100,110]): touch at 100 (closed) -> one row
    # (1,[250,260])x(1,[260,300]): touch at 260 -> one row
    # (2,[0,50])x(2,[51,60]): disjoint -> nothing
    assert got == [(1, 0, 40), (1, 0, 100), (1, 250, 260)]


def test_interval_join_rejects_bad_config(spark):
    from reactivedb_spark.operators.rangejoin import interval_join

    df = spark.createDataFrame([(1, 0, 1)], "k long, s long, e long")
    df2 = spark.createDataFrame([(1, 0, 1)], "k long, s long, e long")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="share non-key columns"):
        interval_join(df, df2, ["k"], "s", "e", "s", "e", bucket_width=10)
    with _pytest.raises(ValueError, match="positive"):
        interval_join(df, df2.withColumnRenamed("s", "s2")
                      .withColumnRenamed("e", "e2"),
                      ["k"], "s", "e", "s2", "e2", bucket_width=0)


def test_interval_join_matches_bruteforce(spark):
    import random

    from reactivedb_spark.operators.rangejoin import interval_join

    rng = random.Random(7)
    L = [(rng.randrange(3), rng.randrange(1000)) for _ in range(40)]
    L = [(k, s, s + rng.randrange(1, 200)) for k, s in L]
    R = [(rng.randrange(3), rng.randrange(1000)) for _ in range(40)]
    R = [(k, s, s + rng.randrange(1, 200)) for k, s in R]
    expected = sorted(
        (lk, ls, le, rs, re)
        for lk, ls, le in L for rk, rs, re in R
        if lk == rk and ls <= re and rs <= le
    )
    ldf = spark.createDataFrame(L, "k long, ls long, le long")
    rdf = spark.createDataFrame(R, "k long, rs long, re long")
    out = interval_join(ldf, rdf, ["k"], "ls", "le", "rs", "re",
                        bucket_width=64)
    got = sorted((r["k"], r["ls"], r["le"], r["rs"], r["re"])
                 for r in out.collect())
    assert got == expected
