"""Error-path contract: typed exceptions matching the reference's error
conditions (errors.py docstrings carry the citations)."""

import pytest

from reactivedb_spark import Engine
from reactivedb_spark.errors import (
    ConfigError,
    UnknownColumnError,
    UnknownTableError,
)

CFG = {
    "tables": [
        {"Source": {"name": "t", "columns": {"a": "Integer"}}},
        {"Derived": {"name": "d",
                     "transform_definition": {"FunctionTransform": {
                         "source_table": "t", "functions": ["b ~ a + 1"]}}}},
    ]
}


def test_unknown_table_and_column(spark, workspace):
    eng = Engine(spark, CFG, workspace=workspace)
    with pytest.raises(UnknownTableError):
        eng.find_one("nope", "a", 1)
    with pytest.raises(UnknownColumnError):
        eng.get_all("t", "nope", 1)
    with pytest.raises(UnknownColumnError):
        eng.delete("t", "nope", 1)


def test_insert_into_derived_rejected(spark, workspace):
    eng = Engine(spark, CFG, workspace=workspace)
    with pytest.raises(ConfigError):
        eng.insert("d", [{"b": 1}])


def test_config_errors(spark):
    with pytest.raises(ConfigError):
        Engine(spark, {"tables": [
            {"Derived": {"name": "x", "transform_definition": {"FunctionTransform": {
                "source_table": "missing", "functions": ["y ~ z + 1"]}}}}]})
    with pytest.raises(ConfigError):  # cycle
        Engine(spark, {"tables": [
            {"Derived": {"name": "x", "transform_definition": {"FunctionTransform": {
                "source_table": "y", "functions": ["c ~ c + 1"]}}}},
            {"Derived": {"name": "y", "transform_definition": {"FunctionTransform": {
                "source_table": "x", "functions": ["c ~ c + 1"]}}}}]})
    with pytest.raises(ConfigError):  # filter must be boolean
        Engine(spark, {"tables": [
            {"Source": {"name": "t", "columns": {"a": "Integer"}}},
            {"Derived": {"name": "f", "transform_definition": {"FilterTransform": {
                "source_table": "t", "filter": "a + 1"}}}}]})
