"""Commit atomicity: a failure anywhere in the cascade reverts every
table to its pre-commit state and listeners see nothing (the reference's
TransactionManager walk-back, database.rs:317-396)."""

import pytest

from reactivedb_spark import Engine

CFG = {
    "tables": [
        {"Source": {"name": "grades", "columns": {"name": "Str", "grade": "Integer"}}},
        {"Derived": {"name": "boom",
                     "transform_definition": {"ActionTransform": {
                         "name": "Boom", "source_table": "grades"}}}},
        {"Derived": {"name": "agg",
                     "transform_definition": {"AggregationTransform": {
                         "source_table": "grades", "aggregated_column": "name",
                         "functions": ["n ~ memo.n + 1"]}}}},
    ]
}


def _exploding(pdf):
    raise RuntimeError("decode failure mid-cascade")


class TestRollback:
    def test_failed_cascade_rolls_back_everything(self, spark, workspace):
        eng = Engine(spark, CFG, workspace=workspace,
                     actions={"Boom": _exploding})
        seen = []
        eng.listen("grades", "Insert", lambda df: seen.append(df.count()))

        eng_ok = None
        with pytest.raises(Exception):
            eng.insert("grades", [{"name": "A", "grade": 1}])

        # source row rolled back, derived tables untouched, no events
        assert eng.table("grades").count() == 0
        assert eng.table("agg").count() == 0
        assert seen == []

        # the engine stays usable after a failed commit
        eng.register_action("Boom", lambda pdf: pdf)
        report = eng.insert("grades", [{"name": "B", "grade": 2}])
        assert eng.table("grades").count() == 1
        assert eng.table("agg").count() == 1
        assert seen == [1]
        assert report["boom"].num_inserted == 1
