"""ChunkTransform: context-window chunking as a config-level reactive
derived table (operators/chunk_transform.py — extension transform #3).
Rowwise explode over deltas, passthrough metadata, provenance-cascaded
deletes, downstream DAG flow."""

import tempfile

import pytest

from reactivedb_spark.engine import Engine
from reactivedb_spark.errors import ConfigError

CFG = {
    "tables": [
        {"Source": {"name": "docs", "columns": {
            "doc_id": "Integer", "body": "Str", "lang": "Str"}}},
        {"Derived": {"name": "doc_chunks",
                     "transform_definition": {"ChunkTransform": {
                         "source_table": "docs", "text_column": "body",
                         "chunk_size": 4, "overlap": 1}}}},
        # downstream of the chunk table: cascade must flow through
        {"Derived": {"name": "en_chunks",
                     "transform_definition": {"FilterTransform": {
                         "source_table": "doc_chunks",
                         "filter": 'lang == "en"'}}}},
    ]
}


@pytest.fixture()
def eng(spark):
    return Engine(spark, CFG, workspace=tempfile.mkdtemp(prefix="rdb_cht_"))


def _chunks(eng, table="doc_chunks"):
    out = {}
    for r in eng.table(table).collect():
        out.setdefault(r["doc_id"], {})[r["chunk_no"]] = (
            r["chunk_text"], r["n_chunk_tokens"], r["lang"]
        )
    return out


def test_chunking_with_overlap_and_passthrough(eng):
    eng.insert("docs", [
        # 7 tokens, size 4 stride 3 → chunks at 0,3: "a b c d", "d e f g"
        {"doc_id": 1, "body": "a b c d e f g", "lang": "en"},
        # 2 tokens → single short chunk
        {"doc_id": 2, "body": "x y", "lang": "de"},
        # empty → no chunks
        {"doc_id": 3, "body": "", "lang": "en"},
    ])
    got = _chunks(eng)
    assert set(got) == {1, 2}
    assert got[1][0] == ("a b c d", 4, "en")
    assert got[1][1] == ("d e f g", 4, "en")
    assert got[2][0] == ("x y", 2, "de")
    # text column replaced by chunk columns; metadata passed through
    cols = eng.table("doc_chunks").columns
    assert "body" not in cols and {"chunk_no", "chunk_text", "lang"} <= set(cols)


def test_delete_cascades_to_chunks_and_downstream(eng):
    eng.insert("docs", [
        {"doc_id": 1, "body": "a b c d e f g", "lang": "en"},
        {"doc_id": 2, "body": "p q r s t", "lang": "en"},
    ])
    assert set(_chunks(eng)) == {1, 2}
    assert set(_chunks(eng, "en_chunks")) == {1, 2}
    eng.delete("docs", "doc_id", 1)
    assert set(_chunks(eng)) == {2}
    assert set(_chunks(eng, "en_chunks")) == {2}


def test_incremental_inserts_only_touch_the_delta(eng):
    eng.insert("docs", [{"doc_id": 1, "body": "a b c d e", "lang": "en"}])
    first = _chunks(eng)
    eng.insert("docs", [{"doc_id": 2, "body": "m n o p q r", "lang": "de"}])
    got = _chunks(eng)
    assert got[1] == first[1]  # existing chunks untouched
    assert 2 in got


def test_invalid_configs_raise(spark):
    bad_col = {
        "tables": [
            {"Source": {"name": "docs", "columns": {"doc_id": "Integer", "body": "Str"}}},
            {"Derived": {"name": "c", "transform_definition": {"ChunkTransform": {
                "source_table": "docs", "text_column": "nope",
                "chunk_size": 4, "overlap": 1}}}},
        ]
    }
    with pytest.raises(ConfigError):
        Engine(spark, bad_col, workspace=tempfile.mkdtemp(prefix="rdb_chb_"))

    bad_overlap = {
        "tables": [
            {"Source": {"name": "docs", "columns": {"doc_id": "Integer", "body": "Str"}}},
            {"Derived": {"name": "c", "transform_definition": {"ChunkTransform": {
                "source_table": "docs", "text_column": "body",
                "chunk_size": 4, "overlap": 4}}}},
        ]
    }
    with pytest.raises(ConfigError):
        Engine(spark, bad_overlap, workspace=tempfile.mkdtemp(prefix="rdb_chb2_"))

    non_str = {
        "tables": [
            {"Source": {"name": "docs", "columns": {"doc_id": "Integer", "body": "Str"}}},
            {"Derived": {"name": "c", "transform_definition": {"ChunkTransform": {
                "source_table": "docs", "text_column": "doc_id",
                "chunk_size": 4, "overlap": 1}}}},
        ]
    }
    with pytest.raises(ConfigError):
        Engine(spark, non_str, workspace=tempfile.mkdtemp(prefix="rdb_chb3_"))


def test_passthrough_collision_with_derived_names_rejected(spark):
    import tempfile

    import pytest as _pytest

    from reactivedb_spark.engine import Engine
    from reactivedb_spark.errors import ConfigError

    bad = {"tables": [
        {"Source": {"name": "t", "columns": {
            "doc_id": "Integer", "body": "Str", "chunk_no": "Integer"}}},
        {"Derived": {"name": "d", "transform_definition": {
            "ChunkTransform": {"source_table": "t", "text_column": "body",
                               "chunk_size": 8, "overlap": 2}}}},
    ]}
    with _pytest.raises(ConfigError, match="collide"):
        Engine(spark, bad, workspace=tempfile.mkdtemp(prefix="rdb_cc_"))
