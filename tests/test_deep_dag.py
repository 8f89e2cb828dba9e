"""Deep DAG: a Function transform downstream of an Aggregation — group-row
replacement (Update = delete+insert) must propagate correctly: old derived
rows vanish by provenance, new ones appear. Plus boundary-semantics checks
for the range verbs on string/decimal columns (quirk #4 kept)."""

from decimal import Decimal

from reactivedb_spark import Engine

CFG = {
    "tables": [
        {"Source": {"name": "grades", "columns": {"name": "Str", "grade": "Integer"}}},
        {"Derived": {"name": "agg",
                     "transform_definition": {"AggregationTransform": {
                         "source_table": "grades", "aggregated_column": "name",
                         "functions": ["n ~ memo.n + 1", "s ~ memo.s + grade"]}}}},
        {"Derived": {"name": "doubled",
                     "transform_definition": {"FunctionTransform": {
                         "source_table": "agg",
                         "functions": ["key2 ~ aggregatedColumn + \"!\"",
                                       "s2 ~ s * 2"]}}}},
    ]
}


def test_update_propagates_through_function_child(spark, workspace):
    eng = Engine(spark, CFG, workspace=workspace)
    eng.insert("grades", [{"name": "A", "grade": 10}])
    assert [r["s2"] for r in eng.table("doubled").collect()] == [20]
    # second insert replaces the group row; the grandchild must follow
    eng.insert("grades", [{"name": "A", "grade": 5}])
    rows = eng.table("doubled").collect()
    assert len(rows) == 1, f"stale grandchild rows: {rows}"
    assert rows[0]["s2"] == 30 and rows[0]["key2"] == "A!"


def test_range_verbs_on_strings_and_decimals(spark, workspace):
    cfg = {"tables": [{"Source": {"name": "t", "columns": {
        "s": "Str", "d": "Decimal"}}}]}
    eng = Engine(spark, cfg, workspace=workspace)
    eng.insert("t", [{"s": x, "d": Decimal(i)} for i, x in
                     enumerate(["a", "b", "c", "d"])])
    # strict < on strings (lexicographic, ascending result order)
    assert [r["s"] for r in eng.less_than("t", "s", "c").collect()] == ["a", "b"]
    # inclusive >= on Decimal (comparisons allowed — Appendix A #3 fix)
    assert [r["s"] for r in eng.greater_than("t", "d", Decimal(2)).collect()] == ["c", "d"]
