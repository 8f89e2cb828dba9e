"""SCD2 history build (operators/scd.py): consecutive-duplicate
collapse, NULL-safe change detection, tiebreak totality, interval
chaining, is_current flag."""

from reactivedb_spark.operators.scd import scd2_history


def _rows(df):
    return sorted(
        ((r["k"], r["a"], r["valid_from"], r["valid_to"], r["is_current"])
         for r in df.collect()),
        key=lambda t: (t[0], t[1] is not None, t[1] or "", t[2]),
    )


def test_collapse_and_intervals(spark):
    df = spark.createDataFrame(
        [
            # key 1: a -> a -> b -> b -> a  (3 versions)
            (1, "a", 10, 1), (1, "a", 20, 2), (1, "b", 30, 3),
            (1, "b", 40, 4), (1, "a", 50, 5),
            # key 2: single state
            (2, "x", 15, 6),
        ],
        "k long, a string, ts long, eid long")
    got = _rows(scd2_history(df, "k", ["a"], "ts", "eid"))
    assert got == [
        (1, "a", 10, 30, 0),
        (1, "a", 50, None, 1),
        (1, "b", 30, 50, 0),
        (2, "x", 15, None, 1),
    ]


def test_null_safe_change_detection(spark):
    df = spark.createDataFrame(
        [(1, None, 10, 1), (1, None, 20, 2), (1, "v", 30, 3),
         (1, None, 40, 4)],
        "k long, a string, ts long, eid long")
    got = _rows(scd2_history(df, "k", ["a"], "ts", "eid"))
    # NULL->NULL is NOT a change; NULL->v and v->NULL are
    assert got == [
        (1, None, 10, 30, 0),
        (1, None, 40, None, 1),
        (1, "v", 30, 40, 0),
    ]


def test_tiebreak_orders_equal_timestamps(spark):
    df = spark.createDataFrame(
        [(1, "b", 10, 2), (1, "a", 10, 1)],
        "k long, a string, ts long, eid long")
    got = _rows(scd2_history(df, "k", ["a"], "ts", "eid"))
    # eid breaks the tie: 'a' opens first, 'b' supersedes at the same ts
    assert got == [
        (1, "a", 10, 10, 0),
        (1, "b", 10, None, 1),
    ]


def test_multi_attribute_change(spark):
    df = spark.createDataFrame(
        [(1, "a", 7, 10, 1), (1, "a", 8, 20, 2), (1, "a", 8, 30, 3)],
        "k long, a string, b long, ts long, eid long")
    out = scd2_history(df, "k", ["a", "b"], "ts", "eid").collect()
    assert sorted((r["b"], r["valid_from"], r["valid_to"]) for r in out) == [
        (7, 10, 20), (8, 20, None),
    ]
