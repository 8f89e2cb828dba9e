"""The general (non-decomposable) memo-fold path and nested type support."""

from decimal import Decimal

import pytest

from reactivedb_spark import Engine
from reactivedb_spark.errors import ConfigError
from reactivedb_spark.types import parse_type
from pyspark.sql import types as T


class TestGeneralFold:
    """`m ~ (memo.m * 2) + grade` is not sum-decomposable → the engine
    compiles an ordered `aggregate(array_sort(collect_list(...)))` fold
    with the reference's sequential semantics (transform.rs:250-266)."""

    CFG = {
        "tables": [
            {"Source": {"name": "grades", "columns": {"name": "Str", "grade": "Integer"}}},
            {"Derived": {"name": "folded",
                         "transform_definition": {"AggregationTransform": {
                             "source_table": "grades",
                             "aggregated_column": "name",
                             "functions": ["m ~ (memo.m * 2) + grade"]}}}},
        ]
    }

    def test_sequential_fold_order(self, spark, workspace):
        eng = Engine(spark, self.CFG, workspace=workspace)
        # arrival order matters: ((0*2+1)*2+2)*2+3 = 11
        eng.insert("grades", [{"name": "A", "grade": 1}])
        eng.insert("grades", [{"name": "A", "grade": 2}])
        eng.insert("grades", [{"name": "A", "grade": 3}])
        r = eng.find_one("folded", "aggregatedColumn", "A")
        assert r["m"] == 11

    def test_fold_classify_is_none(self):
        from reactivedb_spark.config import AggregationTransformConfig
        from reactivedb_spark.expr.parser import parse_statement
        from reactivedb_spark.operators.aggregation import classify

        cfg = AggregationTransformConfig(
            "grades", "name", (parse_statement("m ~ (memo.m * 2) + grade"),)
        )
        assert classify(cfg) is None
        cfg2 = AggregationTransformConfig(
            "grades", "name",
            (parse_statement("n ~ memo.n + 1"),
             parse_statement("s ~ memo.s + grade"),
             parse_statement("avg ~ memo.s/memo.n")),
        )
        # avg references only sum-like memos → decomposable
        assert classify(cfg2) is not None
        cfg3 = AggregationTransformConfig(
            "grades", "name", (parse_statement("avg ~ memo.avg/memo.n"),)
        )
        # self-referencing non-sum memo → general fold
        assert classify(cfg3) is None


class TestNestedTypes:
    def test_parse_type_nested(self):
        assert parse_type("Integer") == T.LongType()
        assert parse_type({"Array": "Str"}) == T.ArrayType(T.StringType())
        assert parse_type({"Map": {"a": "Integer", "b": "Bool"}}) == T.StructType(
            [T.StructField("a", T.LongType()), T.StructField("b", T.BooleanType())]
        )
        with pytest.raises(ConfigError):
            parse_type("Nope")

    def test_array_column_roundtrip(self, spark, workspace):
        cfg = {
            "tables": [
                {"Source": {"name": "docs", "columns": {
                    "k": "Integer", "tags": {"Array": "Str"},
                    "meta": {"Map": {"n": "Integer"}}}}},
                {"Derived": {"name": "f",
                             "transform_definition": {"FilterTransform": {
                                 "source_table": "docs", "filter": "k > 0"}}}},
            ]
        }
        eng = Engine(spark, cfg, workspace=workspace)
        eng.insert("docs", [
            {"k": 1, "tags": ["a", "b"], "meta": {"n": 5}},
            {"k": -1, "tags": [], "meta": {"n": 0}},
        ])
        rows = eng.table("f").collect()
        assert len(rows) == 1
        r = rows[0].asDict(recursive=True)
        assert r["tags"] == ["a", "b"] and r["meta"] == {"n": 5}
        # array columns are queryable (reference: Array-of-indexible is
        # indexible, types.rs:73-84)
        got = eng.find_one("docs", "tags", ["a", "b"])
        assert got is not None and got["k"] == 1
