"""DedupTransform: exact dedup as a config-level reactive derived table
(operators/dedup_transform.py — SURVEY.md §7 phase-6 extension surface).
First-writer-wins, provenance-cascaded deletes, re-derived reps."""

import tempfile

import pytest

from reactivedb_spark.engine import Engine

CFG = {
    "tables": [
        {"Source": {"name": "docs", "columns": {
            "doc_id": "Integer", "body": "Str", "score": "Integer"}}},
        {"Derived": {"name": "unique_docs",
                     "transform_definition": {"DedupTransform": {
                         "source_table": "docs", "key": "body"}}}},
        # downstream of the dedup table: the cascade must flow through
        {"Derived": {"name": "unique_high",
                     "transform_definition": {"FilterTransform": {
                         "source_table": "unique_docs",
                         "filter": "score > 10"}}}},
    ]
}


@pytest.fixture()
def eng(spark):
    return Engine(spark, CFG, workspace=tempfile.mkdtemp(prefix="rdb_ddt_"))


def _reps(eng):
    return {r["body"]: (r["doc_id"], r["score"])
            for r in eng.table("unique_docs").collect()}


def test_first_writer_wins_and_normalization(eng):
    eng.insert("docs", [
        {"doc_id": 1, "body": "Hello World", "score": 5},
        {"doc_id": 2, "body": "  hello world  ", "score": 99},  # same key
        {"doc_id": 3, "body": "other", "score": 20},
    ])
    got = _reps(eng)
    assert len(got) == 2
    assert got["Hello World"] == (1, 5)   # first writer, original casing kept
    assert got["other"] == (3, 20)
    # later arrival of an existing key changes nothing
    eng.insert("docs", [{"doc_id": 4, "body": "HELLO WORLD", "score": 1}])
    assert _reps(eng)["Hello World"] == (1, 5)
    # a genuinely new key lands
    eng.insert("docs", [{"doc_id": 5, "body": "fresh", "score": 30}])
    assert _reps(eng)["fresh"] == (5, 30)


def test_delete_rederives_next_oldest(eng):
    eng.insert("docs", [
        {"doc_id": 1, "body": "k", "score": 5},
        {"doc_id": 2, "body": "K", "score": 50},
        {"doc_id": 3, "body": "k ", "score": 15},
    ])
    assert _reps(eng) == {"k": (1, 5)}
    eng.delete("docs", "doc_id", 1)
    # next-oldest surviving row becomes the representative
    assert _reps(eng) == {"K": (2, 50)}
    eng.delete("docs", "doc_id", 2)
    assert _reps(eng) == {"k ": (3, 15)}
    eng.delete("docs", "doc_id", 3)
    assert _reps(eng) == {}


def test_cascade_through_downstream_filter(eng):
    eng.insert("docs", [
        {"doc_id": 1, "body": "a", "score": 5},    # rep, below filter
        {"doc_id": 2, "body": "b", "score": 50},   # rep, above filter
    ])
    high = {r["body"] for r in eng.table("unique_high").collect()}
    assert high == {"b"}
    # deleting b's source removes it downstream too (provenance cascade)
    eng.delete("docs", "doc_id", 2)
    assert eng.table("unique_high").count() == 0
    # re-deriving a rep that passes the filter re-inserts downstream
    eng.insert("docs", [{"doc_id": 9, "body": "a", "score": 99}])  # not rep (a=1 lives)
    assert eng.table("unique_high").count() == 0
    eng.delete("docs", "doc_id", 1)  # rep flips to doc 9 (score 99)
    assert {r["body"] for r in eng.table("unique_high").collect()} == {"a"}


def test_provenance_points_at_parent_row(eng):
    eng.insert("docs", [{"doc_id": 1, "body": "x", "score": 1}])
    parent = eng.table("docs").collect()[0]
    child = eng.table("unique_docs").collect()[0]
    assert child["_sourceEntryId"] == parent["_entryId"]


def test_listen_events_fire_for_dedup_table(eng):
    events = []
    eng.listen("unique_docs", "Insert", lambda df: events.extend(df.collect()))
    eng.insert("docs", [{"doc_id": 1, "body": "x", "score": 1},
                        {"doc_id": 2, "body": "x", "score": 2}])
    assert len(events) == 1 and events[0]["body"] == "x"


def test_unknown_key_column_rejected(spark):
    from reactivedb_spark.errors import ConfigError

    bad = {"tables": [
        {"Source": {"name": "t", "columns": {"a": "Integer"}}},
        {"Derived": {"name": "d", "transform_definition": {
            "DedupTransform": {"source_table": "t", "key": "nope"}}}},
    ]}
    with pytest.raises(ConfigError):
        Engine(spark, bad, workspace=tempfile.mkdtemp(prefix="rdb_ddt_"))


# -- SampleTransform (extension transform #2, stateless rowwise) -------------

SAMPLE_CFG = {
    "tables": [
        {"Source": {"name": "docs", "columns": {
            "doc_id": "Integer", "body": "Str"}}},
        {"Derived": {"name": "docs_sample",
                     "transform_definition": {"SampleTransform": {
                         "source_table": "docs", "key": "doc_id",
                         "rate_pct": 30}}}},
    ]
}


def test_sample_transform_deterministic_gate_and_cascade(spark):
    import hashlib

    eng = Engine(spark, SAMPLE_CFG,
                 workspace=tempfile.mkdtemp(prefix="rdb_st_"))
    eng.insert("docs", [{"doc_id": i, "body": f"b{i}"} for i in range(100)])

    def gate(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 100 < 30

    want = {i for i in range(100) if gate(i)}
    got = {r["doc_id"] for r in eng.table("docs_sample").collect()}
    assert got == want and 0 < len(got) < 100
    # deletes cascade by provenance
    victim = next(iter(want))
    eng.delete("docs", "doc_id", victim)
    got2 = {r["doc_id"] for r in eng.table("docs_sample").collect()}
    assert got2 == want - {victim}


def test_sample_transform_rejects_bad_rate(spark):
    from reactivedb_spark.errors import ConfigError

    bad = {"tables": [
        {"Source": {"name": "t", "columns": {"a": "Integer"}}},
        {"Derived": {"name": "d", "transform_definition": {
            "SampleTransform": {"source_table": "t", "key": "a",
                                "rate_pct": 150}}}},
    ]}
    with pytest.raises(ConfigError):
        Engine(spark, bad, workspace=tempfile.mkdtemp(prefix="rdb_st_"))


def test_insert_df_order_by_picks_first_writer_deterministically(spark, eng):
    """insert_df(order_by=["doc_id"]) must behave like per-row inserts in
    doc_id order: the representative per body is min(doc_id), regardless
    of the input DataFrame's partitioning/row order."""
    import random

    from pyspark.sql import types as T

    rows = [(i, f"body-{i % 17}", i) for i in range(200)]
    random.Random(7).shuffle(rows)  # hostile input order
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("body", T.StringType()),
            T.StructField("score", T.LongType()),
        ]),
    ).repartition(8)  # hostile partitioning
    eng.insert_df("docs", df, order_by=["doc_id"])
    got = {r["dedupKey"]: r["doc_id"] for r in eng.table("unique_docs").collect()}
    assert len(got) == 17
    assert sorted(got.values()) == list(range(17))  # min doc_id per body
