"""TextStatsTransform: per-document text metrics as a config-level
reactive derived table (operators/textstats_transform.py — extension
transform #4)."""

import tempfile

import pytest

from reactivedb_spark.engine import Engine
from reactivedb_spark.errors import ConfigError

CFG = {
    "tables": [
        {"Source": {"name": "docs", "columns": {
            "doc_id": "Integer", "body": "Str", "source": "Str"}}},
        {"Derived": {"name": "doc_stats",
                     "transform_definition": {"TextStatsTransform": {
                         "source_table": "docs", "text_column": "body"}}}},
        # downstream quality gate: the classic corpus-filter composition
        {"Derived": {"name": "good_docs",
                     "transform_definition": {"FilterTransform": {
                         "source_table": "doc_stats",
                         "filter": "n_tokens > 2"}}}},
    ]
}


@pytest.fixture()
def eng(spark):
    return Engine(spark, CFG, workspace=tempfile.mkdtemp(prefix="rdb_tst_"))


def test_stats_derivation_and_passthrough(eng):
    eng.insert("docs", [
        {"doc_id": 1, "body": "the quick brown fox", "source": "web"},
        {"doc_id": 2, "body": "ab", "source": "books"},
    ])
    rows = {r["doc_id"]: r for r in eng.table("doc_stats").collect()}
    assert rows[1]["n_tokens"] == 4 and rows[1]["n_chars"] == 19
    assert rows[1]["source"] == "web"          # metadata passthrough
    assert rows[1]["lang_guess"] is not None
    assert rows[1]["fingerprint"] == rows[1]["fingerprint"].lower()
    assert rows[2]["n_tokens"] == 1
    assert "body" not in eng.table("doc_stats").columns
    # downstream filter sees the derived metric columns
    good = [r["doc_id"] for r in eng.table("good_docs").collect()]
    assert good == [1]


def test_stats_delete_cascades(eng):
    eng.insert("docs", [
        {"doc_id": 1, "body": "a b c d", "source": "web"},
        {"doc_id": 2, "body": "x y z w", "source": "web"},
    ])
    eng.delete("docs", "doc_id", 1)
    assert [r["doc_id"] for r in eng.table("doc_stats").collect()] == [2]
    assert [r["doc_id"] for r in eng.table("good_docs").collect()] == [2]


def test_stats_rejects_non_string_column(spark):
    bad = {
        "tables": [
            {"Source": {"name": "docs", "columns": {"doc_id": "Integer", "body": "Str"}}},
            {"Derived": {"name": "s", "transform_definition": {"TextStatsTransform": {
                "source_table": "docs", "text_column": "doc_id"}}}},
        ]
    }
    with pytest.raises(ConfigError):
        Engine(spark, bad, workspace=tempfile.mkdtemp(prefix="rdb_tstb_"))


def test_passthrough_collision_with_stat_names_rejected(spark):
    import tempfile

    import pytest as _pytest

    from reactivedb_spark.engine import Engine
    from reactivedb_spark.errors import ConfigError

    bad = {"tables": [
        {"Source": {"name": "t", "columns": {
            "doc_id": "Integer", "body": "Str", "n_tokens": "Integer"}}},
        {"Derived": {"name": "d", "transform_definition": {
            "TextStatsTransform": {"source_table": "t", "text_column": "body"}}}},
    ]}
    with _pytest.raises(ConfigError, match="collide"):
        Engine(spark, bad, workspace=tempfile.mkdtemp(prefix="rdb_tsc_"))
