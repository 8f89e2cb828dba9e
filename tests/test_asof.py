"""as-of join semantics: backward inclusive, per-key, tie-broken."""

from reactivedb_spark.operators.asof import asof_join


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 20, "l2"), (1, 5, "l0"), (2, 15, "l3")],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0, 1), (1, 18, 200.0, 2), (2, 99, 300.0, 3)],
        "k long, t long, v double, rid long",
    )
    out = asof_join(left, right, on=["k"], time_col="t",
                    value_cols=["v"], tie_break="rid")
    got = {r["tag"]: r["v_asof"] for r in out.collect()}
    assert got == {
        "l0": None,    # before any right row
        "l1": 100.0,   # equal time matches (inclusive)
        "l2": 200.0,   # latest at-or-before 20 is t=18
        "l3": None,    # right row is in the future
    }


def test_asof_tie_break_deterministic(spark):
    left = spark.createDataFrame([(1, 10, "x")], "k long, t long, tag string")
    right = spark.createDataFrame(
        [(1, 10, 1.0, 1), (1, 10, 2.0, 2)], "k long, t long, v double, rid long"
    )
    out = asof_join(left, right, on=["k"], time_col="t",
                    value_cols=["v"], tie_break="rid")
    assert out.collect()[0]["v_asof"] == 2.0  # max rid wins


def test_action_registry_from_config(spark, tmp_path, workspace):
    """Reference-style action registry: {file, function} imported from a
    workspace dir (config_reader.rs:63-79; workspace/test_action.py:5-8)."""
    mod = tmp_path / "my_action.py"
    mod.write_text("def drop10(row):\n    row['grade'] = row['grade'] - 10\n    return row\n")
    from reactivedb_spark.config import ActionConfig
    from reactivedb_spark.operators.action import load_from_config

    act = load_from_config(ActionConfig("A", "my_action", "drop10"), str(tmp_path))
    import pandas as pd

    out = act.batch_fn(pd.DataFrame([{"name": "x", "grade": 95}]))
    assert out["grade"].tolist() == [85]


def test_asof_forward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 20, "l2"), (1, 99, "l3")],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0, 1), (1, 18, 200.0, 2)],
        "k long, t long, v double, rid long",
    )
    out = asof_join(left, right, on=["k"], time_col="t",
                    value_cols=["v"], tie_break="rid", direction="forward")
    got = {r["tag"]: r["v_asof"] for r in out.collect()}
    assert got == {
        "l1": 100.0,   # equal time matches (inclusive)
        "l2": None,    # no right row at-or-after 20
        "l3": None,
    }


def test_asof_nearest_row_wins_even_with_null_value(spark):
    """merge_asof semantics: the nearest right ROW is the match; a NULL
    value on it is attached as NULL, never skipped for a farther row —
    and the tolerance gate tests THAT row's time."""
    left = spark.createDataFrame([(1, 100, "x")], "k long, t long, tag string")
    right = spark.createDataFrame(
        [(1, 10, 7.0, 1), (1, 95, None, 2)], "k long, t long, v double, rid long"
    )
    out = asof_join(left, right, on=["k"], time_col="t",
                    value_cols=["v"], tie_break="rid")
    assert out.collect()[0]["v_asof"] is None  # nearest row (t=95) has NULL v
    # with tolerance=50: nearest row t=95 is within 50 → NULL value kept,
    # NOT the t=10 row's 7.0 (which is beyond tolerance)
    out_tol = asof_join(left, right, on=["k"], time_col="t",
                        value_cols=["v"], tie_break="rid", tolerance=50)
    assert out_tol.collect()[0]["v_asof"] is None


def test_asof_tolerance_nulls_far_matches(spark):
    left = spark.createDataFrame(
        [(1, 100, "near"), (1, 500, "far")], "k long, t long, tag string"
    )
    right = spark.createDataFrame([(1, 90, 7.0, 1)], "k long, t long, v double, rid long")
    out = asof_join(left, right, on=["k"], time_col="t",
                    value_cols=["v"], tie_break="rid", tolerance=50)
    got = {r["tag"]: r["v_asof"] for r in out.collect()}
    assert got == {"near": 7.0, "far": None}  # gap 410 > 50 → NULL
