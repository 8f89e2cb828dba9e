"""Connected components: known component structures, chains deeper than
one propagation round, and determinism of labels."""

from pyspark.sql import functions as F

from reactivedb_spark.operators.graph import connected_components


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return {
        r.node: r.cluster for r in connected_components(df).collect()
    }


def test_chain_collapses_transitively(spark):
    # 0-1-2-3-4 chain plus separate 10-11; chain needs >1 round
    got = _cc(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10, 11: 10}


def test_cycle_and_bridge(spark):
    got = _cc(spark, [(5, 6), (6, 7), (7, 5), (7, 20), (30, 31)])
    assert got == {5: 5, 6: 5, 7: 5, 20: 5, 30: 30, 31: 30}


def test_long_path_converges(spark):
    n = 40  # diameter 40: exercises repeated rounds + lineage cutting
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert set(got.values()) == {0} and len(got) == n + 1
