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


def test_chunk_tokens_overlap_and_tail(spark):
    from reactivedb_spark.operators.packing import chunk_tokens

    text = " ".join(f"t{i}" for i in range(100))  # 100 tokens
    df = spark.createDataFrame([(1, text), (2, "a b"), (3, "")],
                               "doc_id long, text string")
    out = chunk_tokens(df, "doc_id", "text", chunk_size=64, overlap=16)
    rows = {(r["doc_id"], r["chunk_no"]): (r["n_tokens"], r["chunk_text"])
            for r in out.collect()}
    # doc 1: starts 0 and 48 → 64 + 52 tokens; chunk 1 starts at t48
    assert rows[(1, 0)][0] == 64 and rows[(1, 0)][1].startswith("t0 t1 ")
    assert rows[(1, 1)][0] == 52 and rows[(1, 1)][1].startswith("t48 t49 ")
    # consecutive chunks share the 16-token overlap
    assert rows[(1, 0)][1].split()[48:] == rows[(1, 1)][1].split()[:16]
    # doc 2: shorter than one chunk → one short chunk; doc 3: no chunks
    assert rows[(2, 0)] == (2, "a b")
    assert not any(d == 3 for d, _ in rows)


def test_chunk_tokens_rejects_bad_overlap(spark):
    import pytest as _pytest

    from reactivedb_spark.operators.packing import chunk_tokens

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_tokens(df, "doc_id", "text", chunk_size=8, overlap=8)
