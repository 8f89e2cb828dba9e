"""Array and Map(struct) columns end-to-end through the engine: config
parse → insert → query verbs (lexicographic Array ordering, the
reference's Vec::cmp — config/types.rs:26) → FunctionTransform."""

from reactivedb_spark import Engine

CFG = {
    "tables": [
        {"Source": {"name": "docs", "columns": {
            "name": "Str",
            "tags": {"Array": "Integer"},
            "meta": {"Map": {"points": "Integer", "label": "Str"}}}}},
        {"Derived": {"name": "scored",
                     "transform_definition": {"FunctionTransform": {
                         "source_table": "docs",
                         "functions": ["tags2 ~ tags",
                                       "score ~ meta.points + 1"]}}}},
    ]
}

ROWS = [
    {"name": "a", "tags": [1, 2, 3], "meta": {"points": 10, "label": "x"}},
    {"name": "b", "tags": [1, 3], "meta": {"points": 20, "label": "y"}},
    {"name": "c", "tags": [2], "meta": {"points": 30, "label": "z"}},
    {"name": "d", "tags": [1, 2], "meta": {"points": 40, "label": "w"}},
]


def test_array_verbs_lexicographic(spark, workspace):
    eng = Engine(spark, CFG, workspace=workspace)
    eng.insert("docs", ROWS)

    # [1,2] < [1,2,3] < [1,3] < [2]  (prefix-shorter-first, Vec::cmp)
    lt = [r["name"] for r in eng.less_than("docs", "tags", [1, 3]).collect()]
    assert lt == ["d", "a"]
    ge = [r["name"] for r in eng.greater_than("docs", "tags", [1, 3]).collect()]
    assert ge == ["b", "c"]
    hit = eng.find_one("docs", "tags", [2])
    assert hit is not None and hit["name"] == "c"
    assert eng.find_one("docs", "tags", [9, 9]) is None


def test_map_struct_through_function_transform(spark, workspace):
    eng = Engine(spark, CFG, workspace=workspace + "_m")
    eng.insert("docs", ROWS)

    got = {
        tuple(r["tags2"]): r["score"]
        for r in eng.table("scored").collect()
    }
    assert got == {(1, 2, 3): 11, (1, 3): 21, (2,): 31, (1, 2): 41}

    # the Map column round-trips intact on the source table
    row = eng.find_one("docs", "name", "b")
    assert row["meta"] == {"points": 20, "label": "y"}
