"""Token-budget sequence packing: chunker bin/offset semantics."""

from reactivedb_spark.operators.packing import pack_by_budget


def test_pack_bins_and_offsets(spark):
    rows = [
        # stratum "a": sizes 50, 60, 100 with budget 100:
        #   doc 1 starts at 0 (bin 0, off 0)
        #   doc 2 starts at 50 (bin 0, off 50) — overflows into bin 1
        #   doc 3 starts at 110 (bin 1, off 10)
        (1, "a", 50), (2, "a", 60), (3, "a", 100),
        # stratum "b": an oversized doc (250 > budget) owns bins 0-2;
        #   the next doc starts at 250 (bin 2, off 50)
        (10, "b", 250), (11, "b", 30),
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, sz long")
    got = {r.doc_id: (r.bin_id, r.offset_in_bin, r.size)
           for r in pack_by_budget(df, "doc_id", "src", "sz", 100).collect()}
    assert got == {
        1: (0, 0, 50), 2: (0, 50, 60), 3: (1, 10, 100),
        10: (0, 0, 250), 11: (2, 50, 30),
    }


def test_pack_deterministic_under_repartition(spark):
    rows = [(i, "s" + str(i % 3), 10 + i % 7) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, src string, sz long")
    a = {(r.doc_id, r.bin_id, r.offset_in_bin)
         for r in pack_by_budget(df, "doc_id", "src", "sz", 64).collect()}
    b = {(r.doc_id, r.bin_id, r.offset_in_bin)
         for r in pack_by_budget(df.repartition(13), "doc_id", "src", "sz", 64).collect()}
    assert a == b and len(a) == 200


def test_weighted_sample_deterministic_and_weight_monotone(spark):
    from pyspark.sql import functions as F

    from reactivedb_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, float(w)) for i, w in enumerate([0.0, 0.1, 0.5, 1.0, 5.0] * 200)],
        "id long, w double",
    )
    a = sorted(r["id"] for r in weighted_sample(df, "id", "w", rate=0.5).collect())
    b = sorted(r["id"] for r in weighted_sample(df, "id", "w", rate=0.5).collect())
    assert a == b and len(a) > 0          # deterministic across runs
    assert 0 not in a                     # zero weight is never kept
    # rate*w >= 1 ⇒ always kept (u < 1 for every 60-bit hash)
    always = {r["id"] for r in df.filter(F.col("w") >= 2.0).collect()}
    assert always <= set(a)
    # higher rate is a superset (same u per id, larger threshold)
    big = sorted(r["id"] for r in weighted_sample(df, "id", "w", rate=0.9).collect())
    assert set(a) <= set(big)
