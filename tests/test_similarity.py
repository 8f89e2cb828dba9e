"""Similarity-search operators: IVF recall vs brute force, determinism."""

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
