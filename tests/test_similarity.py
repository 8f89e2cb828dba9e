"""Similarity-search operators: IVF recall vs brute force, determinism."""

from pyspark.sql import functions as F

from reactivedb_spark.operators import similarity
from reactivedb_spark.sources import read_fixture

SF = "/root/testdata/sf0.001"


class TestIVF:
    def test_ivf_recall_vs_brute_force(self, spark):
        emb = read_fixture(spark, SF, "embeddings")
        brute = [r["vec_id"] for r in
                 similarity.cosine_topk(emb, "vec_id", "embedding", 0, k=10).collect()]
        ivf = [r["vec_id"] for r in
               similarity.ivf_topk(emb, "vec_id", "embedding", 0, k=10,
                                   n_clusters=8, nprobe=4).collect()]
        assert len(ivf) == 10
        # probing half the clusters must recover a solid share of the true
        # top-10 (random 64-d embeddings: neighbors spread across clusters)
        assert len(set(brute) & set(ivf)) >= 4

    def test_ivf_deterministic(self, spark):
        emb = read_fixture(spark, SF, "embeddings")
        a = similarity.ivf_topk(emb, "vec_id", "embedding", 0, k=10).collect()
        b = similarity.ivf_topk(emb, "vec_id", "embedding", 0, k=10).collect()
        assert [(r["vec_id"], r["cos_sim"]) for r in a] == [
            (r["vec_id"], r["cos_sim"]) for r in b
        ]

    def test_assignments_cover_all_vectors(self, spark):
        emb = read_fixture(spark, SF, "embeddings")
        assignments, cents = similarity.ivf_assignments(
            emb, "vec_id", "embedding", k=8, iters=1
        )
        assert assignments.count() == emb.count()
        assert len(cents) == 8
        clusters = {r["cluster"] for r in assignments.select("cluster").distinct().collect()}
        assert clusters <= set(range(8)) and len(clusters) >= 2


class TestSemanticDedup:
    def test_exact_and_scaled_copies_dropped_min_id_survives(self, spark):
        emb = read_fixture(spark, SF, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        ).limit(100)
        copies = emb.filter(F.col("vec_id") % 7 == 0).select(
            (F.col("vec_id") + 10_000).alias("vec_id"),
            # scaled copy: cosine is scale-invariant, so this is a true
            # semantic duplicate even though no element matches
            F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
        )
        corpus = emb.unionByName(copies)
        out = similarity.semantic_dedup(corpus, "vec_id", "embedding",
                                        n_clusters=4, threshold=0.999)
        survivors = {r["vec_id"] for r in out.collect()}
        originals = {r["vec_id"] for r in emb.collect()}
        copy_ids = {r["vec_id"] for r in copies.select("vec_id").collect()}
        # every original survives (randoms are nowhere near 0.999 cosine)
        assert originals <= survivors
        # a x2-scaled vector has identical L2-normalized direction, but its
        # SQUARED-L2 cluster can differ from the original's; any copy that
        # shares its original's cluster must be dropped — with 4 clusters
        # and unit-ish vectors, that is the common case
        dropped = copy_ids - survivors
        assert dropped, "no scaled copy was deduplicated"
        # survivors of the copy set must be cluster-separated from their
        # originals (never a same-cluster pair at cosine ~1 left behind)
        # cross-check against the same quantizer semantic_dedup uses
        assign = dict(
            (r["vec_id"], r["cluster"])
            for r in similarity.seed_assignments2(
                corpus, "vec_id", "embedding", n_clusters=4
            ).collect()
        )
        for cid in copy_ids & survivors:
            assert assign[cid] != assign[cid - 10_000]

    def test_no_duplicates_means_no_drops(self, spark):
        emb = read_fixture(spark, SF, "embeddings").limit(50)
        out = similarity.semantic_dedup(emb, "vec_id", "embedding",
                                        n_clusters=4, threshold=0.999)
        assert out.count() == 50


def test_sq8_codes_bounds_and_reconstruction_error(spark):
    from reactivedb_spark.operators.similarity import sq8_codes

    import random
    rng = random.Random(5)
    df = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)],
        "vec_id long, embedding array<double>")
    codes, params = sq8_codes(df, "vec_id", "embedding")
    rows = codes.collect()
    assert all(0 <= r["code"] <= 255 for r in rows)
    # reconstruction error bounded by one quantization step per element
    p = {r["j"]: (r["mn"], r["mx"]) for r in params.collect()}
    from reactivedb_spark.operators.similarity import exploded
    xl = {(r["vec_id"], r["j"]): r["xl"]
          for r in exploded(df, "vec_id", "embedding").collect()}
    for r in rows:
        mn, mx = p[r["j"]]
        step = (mx - mn) // 255 + 1
        assert abs(xl[(r["vec_id"], r["j"])] - r["rl"]) <= step


def test_sq8_topk_finds_exact_duplicate_first(spark):
    from reactivedb_spark.operators.similarity import sq8_topk

    import random
    rng = random.Random(9)
    base = [rng.uniform(-1, 1) for _ in range(8)]
    rows = [(0, base), (1, list(base))]  # 1 duplicates the query
    rows += [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(2, 30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sq8_topk(df, "vec_id", "embedding", 0, k=3).collect()
    assert got[0]["vec_id"] == 1  # the duplicate reconstructs nearest
