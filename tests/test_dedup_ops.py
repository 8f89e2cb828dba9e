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
