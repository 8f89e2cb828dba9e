"""Group-wise imputation (operators/impute.py): exact group mean,
deterministic mode tie-break, global fallbacks, fully-NULL columns."""

from reactivedb_spark.operators.impute import impute


def test_numeric_group_mean_and_global_fallback(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", None), ("a", 20), ("b", None), ("c", 7)],
        "g string, x int")
    out = {(r["g"], r["x"]) for r in
           impute(df, ["g"], numeric_cols=["x"]).collect()}
    # group a mean = 15; group b has NO value -> global mean (10+20+7)/3
    assert ("a", 15.0) in out and ("a", 10.0) in out and ("a", 20.0) in out
    assert ("b", (10 + 20 + 7) / 3) in out
    assert ("c", 7.0) in out


def test_mode_tie_breaks_lexicographically(spark):
    df = spark.createDataFrame(
        [("a", "y"), ("a", "x"), ("a", None), ("b", None)],
        "g string, c string")
    rows = impute(df, ["g"], categorical_cols=["c"]).collect()
    got = sorted((r["g"], r["c"]) for r in rows)
    # tie x/y in group a -> 'x' (lexicographic); group b -> global mode 'x'
    assert got == [("a", "x"), ("a", "x"), ("a", "y"), ("b", "x")]


def test_fully_null_column_stays_null(spark):
    df = spark.createDataFrame(
        [("a", None), ("b", None)], "g string, x int")
    rows = impute(df, ["g"], numeric_cols=["x"]).collect()
    assert all(r["x"] is None for r in rows)


def test_row_count_and_column_set_preserved(spark):
    df = spark.createDataFrame(
        [("a", 1, "u"), ("a", None, None)] * 3, "g string, x int, c string")
    out = impute(df, ["g"], numeric_cols=["x"], categorical_cols=["c"])
    assert out.columns == ["g", "x", "c"]
    assert out.count() == 6
