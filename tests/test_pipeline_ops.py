"""Unit + plan-shape tests for the round-4 pipeline operators:
retrieval (BM25), timeseries (resample/rolling), numeric
(histogram/winsorize/profile), span census, PQ-ANN, and the
partition-pruned source round-trip."""

import contextlib
import io
import math
import re

import pytest
from pyspark.sql import functions as F

from reactivedb_spark.operators import dedup, numeric, retrieval, timeseries
from reactivedb_spark.operators.similarity import pq_codes, pq_topk


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# -- BM25 ----------------------------------------------------------------------

def test_bm25_ranks_term_dense_docs_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark filler"),
            (2, "spark filler filler filler filler filler"),
            (3, "filler filler filler filler"),
            (4, "spark spark other other"),
        ],
        "doc_id long, text string",
    )
    out = retrieval.bm25_topk(docs, "spark", k=3).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[0] in (1, 4)  # highest tf, short docs
    assert 3 not in ids      # no matching term → no row
    assert all(r["score"] > 0 for r in out)
    assert out[0]["n_terms"] == 1

    # hand-check doc 1's score: N=4, df=3, dl=4, avgdl=18/4
    n, df_, tf, dl, avgdl = 4.0, 3.0, 3.0, 4.0, 18 / 4
    idf = math.log(1.0 + (n - df_ + 0.5) / (df_ + 0.5))
    expected = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    got = [r["score"] for r in out if r["doc_id"] == 1][0]
    assert abs(got - expected) < 1e-6


def test_bm25_rejects_empty_query(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        retrieval.bm25_topk(docs, "   ")


def test_bm25_topk_is_take_ordered(spark):
    docs = spark.createDataFrame([(1, "a b"), (2, "a")], "doc_id long, text string")
    plan = _plan(retrieval.bm25_topk(docs, "a b", k=1))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


# -- timeseries: resample + gap fill -------------------------------------------

def test_resample_fills_gaps_forward(spark):
    # key "a": buckets 0, 3 observed → 1, 2 forward-filled from bucket 0
    df = spark.createDataFrame(
        [
            ("a", 5, 1, 10.0),   # bucket 0
            ("a", 9, 2, 20.0),   # bucket 0, later (t=9) → representative
            ("a", 35, 3, 30.0),  # bucket 3
            ("b", 12, 4, 5.0),   # bucket 1 only
        ],
        "k string, t long, id long, v double",
    )
    out = timeseries.resample(df, "k", "t", "v", "id", interval_ns=10)
    rows = {(r["key"], r["bucket"]): r for r in out.collect()}
    assert len(rows) == 5  # a:0..3, b:1
    assert rows[("a", 0)]["value"] == 20.0 and not rows[("a", 0)]["filled"]
    assert rows[("a", 1)]["value"] == 20.0 and rows[("a", 1)]["filled"]
    assert rows[("a", 2)]["value"] == 20.0 and rows[("a", 2)]["filled"]
    assert rows[("a", 3)]["value"] == 30.0 and not rows[("a", 3)]["filled"]
    assert rows[("b", 1)]["bucket_start_ns"] == 10
    assert rows[("b", 1)]["value"] == 5.0


def test_resample_tiebreaks_on_id_within_same_time(spark):
    df = spark.createDataFrame(
        [("a", 5, 1, 1.0), ("a", 5, 2, 2.0)], "k string, t long, id long, v double"
    )
    out = timeseries.resample(df, "k", "t", "v", "id", interval_ns=10).collect()
    assert len(out) == 1 and out[0]["value"] == 2.0  # higher id wins


# -- timeseries: rolling -------------------------------------------------------

def test_rolling_partial_frames_and_exact_sums(spark):
    df = spark.createDataFrame(
        [("u", i, float(i)) for i in range(1, 7)], "k string, id long, v double"
    )
    out = timeseries.rolling(df, "k", ["id"], "v", n=3).orderBy("id").collect()
    assert [r["roll_n"] for r in out] == [1, 2, 3, 3, 3, 3]
    assert out[0]["roll_sum"] == 1.0
    assert out[2]["roll_sum"] == 6.0          # 1+2+3
    assert out[5]["roll_sum"] == 15.0         # 4+5+6
    assert out[5]["roll_min"] == 4.0 and out[5]["roll_max"] == 6.0
    assert abs(out[5]["roll_avg"] - 5.0) < 1e-12


# -- numeric: histogram --------------------------------------------------------

def test_histogram_clamps_outliers_to_edge_bins(spark):
    df = spark.createDataFrame(
        [(v,) for v in [-5.0, 0.0, 4.9, 5.0, 9.9, 100.0]], "x double"
    )
    out = {r["bin"]: r for r in
           numeric.histogram(df, "x", lo=0.0, hi=10.0, nbins=2).collect()}
    assert out[0]["n"] == 3   # -5 (clamped), 0, 4.9
    assert out[1]["n"] == 3   # 5.0, 9.9, 100 (clamped)
    assert out[0]["bin_lo"] == 0.0 and out[1]["bin_lo"] == 5.0
    assert out[1]["sum_v"] == pytest.approx(114.9)


# -- numeric: winsorize --------------------------------------------------------

def test_winsorize_clips_tails(spark):
    # 0..19 in one group, ntiles=20 → each value its own tile;
    # lo_cut = 0's tile-1 max = 0 … hi_cut = min of tile 20 = 19: no-op.
    # Add extreme outliers and check they clip to the adjacent extremes.
    vals = list(range(20)) + [10_000, -10_000]
    df = spark.createDataFrame(
        [("g", float(v), i) for i, v in enumerate(vals)], "g string, v double, id long"
    )
    # 22 rows, 11 tiles → 2 per tile: tile 1 = {-10000, 0} → lo_cut 0;
    # tile 11 = {19, 10000} → hi_cut 19. Outliers clip to [0, 19].
    out = numeric.winsorize_sum(df, "g", "v", "id", ntiles=11).collect()[0]
    assert out["n"] == 22
    assert out["sum_raw"] == pytest.approx(sum(vals))
    assert out["sum_winsor"] == pytest.approx(sum(range(20)) + 0 + 19)


# -- numeric: profile ----------------------------------------------------------

def test_profile_single_pass_stats(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (2, "b", None)],
        "k long, s string, v double",
    )
    out = {r["col_name"]: r for r in numeric.profile(df).collect()}
    assert set(out) == {"k", "s", "v"}
    assert all(r["n_rows"] == 3 for r in out.values())
    assert out["k"]["n_nulls"] == 0 and out["k"]["n_distinct"] == 2
    assert out["k"]["min_v"] == 1.0 and out["k"]["max_v"] == 2.0
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_v"] is None  # non-numeric: no min/max
    assert out["v"]["n_nulls"] == 1 and out["v"]["max_v"] == 2.5


# -- span census ---------------------------------------------------------------

def test_span_census_requires_cross_doc_duplication(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d a b c d"),   # "a b c" twice WITHIN one doc
            (2, "x a b c d y"),       # "a b c" here too → cross-doc
            (3, "p q r s t"),
        ],
        "doc_id long, text string",
    )
    out = {r["span"]: r for r in
           dedup.span_census(df, "doc_id", "text", n=3, top=None).collect()}
    assert "a b c" in out
    assert out["a b c"]["n_docs"] == 2
    assert out["a b c"]["n_occurrences"] == 3  # 2 in doc 1 + 1 in doc 2
    # intra-doc-only repeats are excluded by min_docs=2
    assert "d a b" not in out
    # doc 3's spans occur once → excluded
    assert "p q r" not in out


def test_span_census_top_ordering(spark):
    df = spark.createDataFrame(
        [(i, "a b c d e f") for i in range(4)] + [(9, "c d e f g h")],
        "doc_id long, text string",
    )
    out = dedup.span_census(df, "doc_id", "text", n=4, top=2).collect()
    assert out[0]["span"] == "c d e f"  # in 5 docs — most duplicated
    assert out[0]["n_docs"] == 5


# -- PQ ANN --------------------------------------------------------------------

def _clustered_vectors(spark, dim=8):
    # 16 well-separated seed vectors (ids 0..15) + exact duplicates of
    # seeds 0 and 1 at higher ids
    rows = []
    for i in range(16):
        v = [0.0] * dim
        v[i % dim] = 1.0 if i < dim else -1.0
        rows.append((i, v))
    rows.append((100, rows[0][1]))   # duplicate of seed 0
    rows.append((101, rows[1][1]))   # duplicate of seed 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_codes_shape_and_determinism(spark):
    df = _clustered_vectors(spark)
    codes, codebook = pq_codes(df, "vec_id", "embedding", m=4, ksub=16)
    c = codes.collect()
    assert len(c) == 18 * 4  # one code per (vector, subspace)
    assert all(0 <= r["code"] < 16 for r in c)
    assert codebook.count() == 16 * 8  # ksub × dim cells
    # a seed vector's codes quantize to itself → zero reconstruction
    # error → its duplicate scores ADC distance 0 (next test)


def test_pq_topk_finds_exact_duplicate_first(spark):
    df = _clustered_vectors(spark)
    out = pq_topk(df, "vec_id", "embedding", 0, k=3, m=4, ksub=16).collect()
    assert out[0]["vec_id"] == 100       # the exact duplicate of the query
    assert out[0]["d2_fp"] == 0          # zero quantized distance, exactly
    plan = _plan(pq_topk(df, "vec_id", "embedding", 0, k=3, m=4, ksub=16))
    assert "CartesianProduct" not in plan


def test_pq_rejects_indivisible_dim(spark):
    df = spark.createDataFrame([(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        pq_codes(df, "vec_id", "embedding", m=2, ksub=1)


# -- partitioned source: pruning ----------------------------------------------

def test_partitioned_roundtrip_prunes_partitions(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, ["red", "green", "blue"][i % 3]) for i in range(30)],
        "id long, color string",
    )
    path = str(tmp_path / "part")
    df.write.mode("overwrite").partitionBy("color").parquet(path)
    back = spark.read.parquet(path).filter(F.col("color") == "red")
    plan = _plan(back)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "color" in m.group(1), f"no partition filter in plan: {m}"
    assert back.count() == 10


# -- sigma outliers --------------------------------------------------------------

def test_sigma_outliers_exact_decision(spark):
    # group "a": 10 values at 1.0 and one at 100.0 → the 100 is >3σ out;
    # group "b": uniform → no outliers
    rows = [("a", 1.0)] * 10 + [("a", 100.0)] + [("b", 5.0)] * 5
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in
           numeric.sigma_outliers(df, "g", "v", k_sigma=3, scale=100).collect()}
    assert out["a"]["n"] == 11 and out["a"]["n_outliers"] == 1
    assert out["b"]["n"] == 5 and out["b"]["n_outliers"] == 0
    assert out["a"]["mean"] == pytest.approx((10 * 1.0 + 100.0) / 11)
    # zero-variance group: rhs is 0, lhs is 0 for every row → no outliers
    assert out["b"]["mean"] == pytest.approx(5.0)


# -- span dedup rewrite ----------------------------------------------------------

def test_span_dedup_removes_all_but_canonical(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d x y"),      # lowest doc id containing "a b c d"
            (2, "p q a b c d r s"),  # loses positions 3-6
            (3, "u v w z"),          # untouched
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           dedup.span_dedup(df, "doc_id", "text", n=4).collect()}
    assert out[1]["clean_text"] == "a b c d x y"
    assert out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "p q r s"
    assert out[2]["n_removed"] == 4
    assert out[3]["clean_text"] == "u v w z"
    assert out[3]["n_tokens"] == 4


def test_span_dedup_merges_overlapping_spans(spark):
    # doc 2 shares the 5-token run "a b c d e" with doc 1 → its two
    # overlapping duplicated 4-spans ("a b c d", "b c d e") cover
    # positions 1-5 once (distinct), not twice
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e z")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           dedup.span_dedup(df, "doc_id", "text", n=4).collect()}
    assert out[1]["clean_text"] == "a b c d e"
    assert out[2]["clean_text"] == "z"
    assert out[2]["n_removed"] == 5


def test_span_dedup_can_empty_a_document(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           dedup.span_dedup(df, "doc_id", "text", n=4).collect()}
    assert out[1]["clean_text"] == "a b c d"
    assert out[2]["clean_text"] == "" and out[2]["n_removed"] == 4


def test_pq_rerank_recovers_exact_ranking_with_full_shortlist(spark):
    from reactivedb_spark.operators.similarity import cosine_topk, pq_topk_rerank

    df = _clustered_vectors(spark)
    # shortlist >= corpus → stage 2 sees everything → exact brute-force order
    exact = [(r["vec_id"], r["cos_sim"])
             for r in cosine_topk(df, "vec_id", "embedding", 0, k=5).collect()]
    rr = [(r["vec_id"], r["cos_sim"])
          for r in pq_topk_rerank(df, "vec_id", "embedding", 0,
                                  k=5, shortlist=100, m=4, ksub=16).collect()]
    assert rr == exact
    # tight shortlist still surfaces the exact duplicate first, with an
    # EXACT cosine (not the quantized distance)
    top = pq_topk_rerank(df, "vec_id", "embedding", 0,
                         k=1, shortlist=3, m=4, ksub=16).collect()[0]
    assert top["vec_id"] == 100 and top["cos_sim"] == 1.0


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    import os as _os

    left = spark.createDataFrame(
        [(i % 40, i, float(i)) for i in range(400)], "k long, id long, v double"
    )
    right = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(40)], "k2 long, grp string"
    )
    (left.write.mode("overwrite").format("parquet").bucketBy(8, "k").sortBy("k")
         .option("path", str(tmp_path / "l")).saveAsTable("bkt_l_test"))
    (right.write.mode("overwrite").format("parquet").bucketBy(8, "k2").sortBy("k2")
          .option("path", str(tmp_path / "r")).saveAsTable("bkt_r_test"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        l, r = spark.table("bkt_l_test"), spark.table("bkt_r_test")
        join_only = l.join(r, l.k == r.k2)
        plan = join_only._jdf.queryExecution().executedPlan().toString()
        # both sides bucketed on the join key with equal counts: the
        # SortMergeJoin reads co-located buckets — zero shuffles in the
        # join subtree (a downstream groupBy on another key would still
        # add its own, unrelated, exchange)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan
        assert join_only.groupBy("grp").count().count() == 3
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_l_test")
        spark.sql("DROP TABLE IF EXISTS bkt_r_test")


def test_ann_variants_recall_floor_on_fixture(spark):
    """Approximation quality: on the sf0.001 embeddings fixture, each
    ANN path's top-10 must overlap the exact brute-force top-10 by a
    documented floor. All-exact arithmetic → the measured recall is a
    deterministic property of the fixture, not a flaky statistic."""
    from reactivedb_spark.operators.similarity import (
        cosine_topk, ivf_seed_topk, pq_topk, pq_topk_rerank,
    )
    from reactivedb_spark.sources.readers import read_fixture

    emb = read_fixture(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {r["vec_id"] for r in cosine_topk(emb, "vec_id", "embedding", 0, k=10).collect()}
    assert len(exact) == 10

    def recall(df):
        return len({r["vec_id"] for r in df.collect()} & exact) / 10

    # measured on this fixture (500 near-uniform vectors — a hard case
    # for 4-byte seed-codebook quantization): pq 0.2, rerank@50 0.5,
    # ivf(4/16) 0.9. Floors pin those levels; the ordering property —
    # exact re-rank improves on raw ADC, and scanning 1/4 of the corpus
    # (IVF) beats both — must always hold.
    r_pq = recall(pq_topk(emb, "vec_id", "embedding", 0, k=10))
    r_rr = recall(pq_topk_rerank(emb, "vec_id", "embedding", 0, k=10, shortlist=50))
    r_ivf = recall(ivf_seed_topk(emb, "vec_id", "embedding", 0, k=10))
    assert r_pq >= 0.2
    assert r_rr >= 0.5 and r_rr >= r_pq
    assert r_ivf >= 0.8


def test_containment_scores_near_superset(spark):
    # doc 2 is doc 1 plus wrapper text: containment 1.0, Jaccard 0.5
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "intro alpha beta gamma delta outro closing text"),
            (3, "unrelated words entirely here"),
        ],
        "doc_id long, text string",
    )
    cont = {(r["doc_a"], r["doc_b"]): r["containment"]
            for r in dedup.containment_pairs(df, "doc_id", "text").collect()}
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in dedup.jaccard_pairs(df, "doc_id", "text").collect()}
    if (1, 2) in cont:  # LSH candidacy tracks Jaccard — tolerate a miss
        assert cont[(1, 2)] == 1.0
        assert jac[(1, 2)] == pytest.approx(0.5)
    # invalid measure rejected
    with pytest.raises(ValueError):
        dedup.jaccard_pairs(df, "doc_id", "text", measure="dice")


def test_bm25_empty_corpus_raises_value_error(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None)], "doc_id: long, text: string"
    )
    with pytest.raises(ValueError, match="no token-bearing documents"):
        retrieval.bm25_topk(df, "apple banana")
