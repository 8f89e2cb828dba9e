"""Engine tests replicating the reference's golden scenarios
(reactive_db/src/tests/database_test.rs; usage_example.rs; SURVEY.md §5 /
FIXTURES.md Part 1)."""

import random
from decimal import Decimal

import pytest

from reactivedb_spark import Engine

TEST_CFG = {
    "tables": [
        {"Source": {"name": "testTable",
                    "columns": {"testForIndex": "Integer", "testForIteration": "Integer"}}},
        {"Derived": {"name": "derived",
                     "transform_definition": {"FunctionTransform": {
                         "source_table": "testTable",
                         "functions": ["newColumn ~ testForIteration + 2"]}}}},
        {"Derived": {"name": "filterTest",
                     "transform_definition": {"FilterTransform": {
                         "source_table": "testTable",
                         "filter": "(testForIndex < 11) && (testForIteration > 14)"}}}},
    ]
}

USERS_CFG = {
    "tables": [
        {"Source": {"name": "users", "columns": {"name": "Str", "age": "Integer"}}},
        {"Source": {"name": "grades", "columns": {"name": "Str", "grade": "Integer"}}},
        {"Derived": {"name": "unionTest",
                     "transform_definition": {"UnionTransform": {
                         "tables_and_foreign_keys": [["users", "name"], ["grades", "name"]]}}}},
        {"Derived": {"name": "aggregationTest",
                     "transform_definition": {"AggregationTransform": {
                         "source_table": "grades",
                         "aggregated_column": "name",
                         "functions": ["count ~ memo.count + 1.0",
                                       "sum ~ memo.sum + grade",
                                       "average ~ memo.sum/memo.count"]}}}},
    ]
}


class TestReferenceScenarios:
    """database_test.rs:18-173, run batched."""

    @pytest.fixture(scope="class")
    def engine(self, spark, tmp_path_factory):
        eng = Engine(spark, TEST_CFG, workspace=str(tmp_path_factory.mktemp("ws")))
        rng = random.Random(42)
        rows = [{"testForIndex": rng.randint(0, 9), "testForIteration": i}
                for i in range(29)]
        eng.insert("testTable", rows)
        return eng

    def test_insert_many_fetch_one(self, engine):
        row = engine.find_one("testTable", "testForIteration", 15)
        assert row is not None and row["testForIteration"] == 15
        # derived FunctionTransform row via _sourceEntryId provenance
        # (database_test.rs:60-80)
        drow = engine.find_one("derived", "_sourceEntryId", row["_entryId"])
        assert drow is not None and drow["newColumn"] == 17

    def test_less_than_strict(self, engine):
        got = [r["testForIteration"]
               for r in engine.less_than("testTable", "testForIteration", 5).collect()]
        assert got == [0, 1, 2, 3, 4]  # strict <, ascending index order

    def test_greater_than_inclusive(self, engine):
        got = [r["testForIteration"]
               for r in engine.greater_than("testTable", "testForIteration", 10).collect()]
        assert got == list(range(10, 29))  # inclusive >=

    def test_filter_transform(self, engine):
        rows = engine.table("filterTest").collect()
        assert all(r["testForIndex"] < 11 and r["testForIteration"] > 14 for r in rows)
        assert len(rows) == 14  # iterations 15..28 (all indexes are < 11)

    def test_derived_projection_only_assigned_columns(self, engine):
        # FunctionTransform is a projection, not an extend (transform.rs:128-148)
        cols = set(engine.table("derived").columns)
        assert cols == {"_entryId", "_sourceEntryId", "newColumn"}


class TestUsageExample:
    """usage_example.rs:7-52 / examples/sample.py:8-26."""

    @pytest.fixture(scope="class")
    def engine(self, spark, tmp_path_factory):
        eng = Engine(spark, USERS_CFG, workspace=str(tmp_path_factory.mktemp("ws")))
        eng.insert("users", [{"name": "Alex", "age": 22}])
        eng.insert("grades", [{"name": "Alex", "grade": 95}])
        return eng

    def test_union_merges_on_matching_key(self, engine):
        rows = engine.table("unionTest").collect()
        assert len(rows) == 1
        r = rows[0].asDict()
        assert r["matchingKey"] == "Alex" and r["age"] == 22 and r["grade"] == 95
        assert "name" not in r  # fk column renamed away (transform.rs:209-215)

    def test_aggregation(self, engine):
        r = engine.find_one("aggregationTest", "aggregatedColumn", "Alex")
        assert r["count"] == Decimal("1")
        assert r["sum"] == 95
        assert r["average"] == Decimal("95")

    def test_aggregation_updates_in_place(self, spark, tmp_path_factory):
        eng = Engine(spark, USERS_CFG, workspace=str(tmp_path_factory.mktemp("ws2")))
        eng.insert("grades", [{"name": "B", "grade": 10}])
        eng.insert("grades", [{"name": "B", "grade": 20}])
        rows = eng.table("aggregationTest").filter("aggregatedColumn = 'B'").collect()
        assert len(rows) == 1  # group row replaced, not duplicated
        r = rows[0].asDict()
        assert r["count"] == Decimal("2") and r["sum"] == 30 and r["average"] == Decimal("15")

    def test_union_last_writer_wins_per_column(self, spark, tmp_path_factory):
        eng = Engine(spark, USERS_CFG, workspace=str(tmp_path_factory.mktemp("ws3")))
        eng.insert("users", [{"name": "C", "age": 30}])
        eng.insert("grades", [{"name": "C", "grade": 50}])
        eng.insert("users", [{"name": "C", "age": 31}])  # later write wins for age
        rows = eng.table("unionTest").filter("matchingKey = 'C'").collect()
        assert len(rows) == 1
        r = rows[0].asDict()
        assert r["age"] == 31 and r["grade"] == 50  # grade survives (per-column LWW)


class TestDeleteCascadeAndListen:
    def test_cascading_delete(self, spark, workspace):
        eng = Engine(spark, USERS_CFG, workspace=workspace)
        eng.insert("users", [{"name": "D", "age": 40}])
        eng.insert("grades", [{"name": "D", "grade": 70}, {"name": "E", "grade": 80}])
        assert eng.table("unionTest").count() == 2
        report = eng.delete("grades", "name", "D")
        assert report["grades"].num_deleted == 1
        # aggregation group for D vanishes; E survives
        aggs = {r["aggregatedColumn"] for r in eng.table("aggregationTest").collect()}
        assert aggs == {"E"}

    def test_listen_events(self, spark, workspace):
        eng = Engine(spark, TEST_CFG, workspace=workspace)
        seen = []
        eng.listen("derived", "Insert", lambda df: seen.append(df.count()))
        eng.insert("testTable", [{"testForIndex": 1, "testForIteration": 10},
                                 {"testForIndex": 2, "testForIteration": 20}])
        assert seen == [2]  # one batch event with both derived rows

    def test_listen_delete_events(self, spark, workspace):
        eng = Engine(spark, TEST_CFG, workspace=workspace + "_del")
        deleted_rows = []
        eng.listen("derived", "Delete",
                   lambda df: deleted_rows.extend(r["newColumn"] for r in df.collect()))
        eng.insert("testTable", [{"testForIndex": 1, "testForIteration": 10},
                                 {"testForIndex": 2, "testForIteration": 20}])
        eng.delete("testTable", "testForIteration", 10)
        # cascade delete pushed a Delete event carrying the derived row
        assert deleted_rows == [12]

    def test_schema_mismatch_rejected(self, spark, workspace):
        from reactivedb_spark.errors import SchemaMismatchError

        eng = Engine(spark, TEST_CFG, workspace=workspace)
        with pytest.raises(SchemaMismatchError):
            eng.insert("testTable", [{"nope": 1}])


class TestActionTransform:
    def test_action_grade_minus_10(self, spark, workspace):
        # mirrors workspace/test_action.py:5-8 (grade -= 10)
        cfg = {
            "tables": [
                {"Source": {"name": "grades", "columns": {"name": "Str", "grade": "Integer"}}},
                {"Derived": {"name": "actionTest",
                             "transform_definition": {"ActionTransform": {
                                 "name": "TestAction", "source_table": "grades"}}}},
            ]
        }

        def batch_minus_10(pdf):
            out = pdf.copy()
            out["grade"] = out["grade"] - 10
            return out

        eng = Engine(spark, cfg, workspace=workspace,
                     actions={"TestAction": batch_minus_10})
        eng.insert("grades", [{"name": "A", "grade": 95}])
        r = eng.find_one("actionTest", "name", "A")
        assert r["grade"] == 85


def test_async_listener_does_not_stall_commits(spark, workspace):
    """VERDICT r4 #7: a slow subscriber must not add its latency to the
    commit path when registered asynchronous (reference mpsc parity);
    flush_listeners() is the delivery barrier, and subscriber
    exceptions land in listener_errors instead of poisoning the drain."""
    import time

    eng = Engine(spark, {"tables": [{"Source": {"name": "people", "columns": {
        "name": "Str", "age": "Integer"}}}]}, workspace=workspace)
    seen = []

    def slow(df):
        time.sleep(2.0)
        seen.append(df.count())

    def broken(df):
        raise RuntimeError("subscriber bug")

    eng.listen("people", "Insert", slow, asynchronous=True)
    eng.listen("people", "Insert", broken, asynchronous=True)
    # baseline: one warm-up commit before timing
    eng.insert("people", [{"name": "warm", "age": 1}])
    t0 = time.perf_counter()
    eng.insert("people", [{"name": "a", "age": 2}])
    commit_wall = time.perf_counter() - t0
    assert commit_wall < 2.0, f"async listener stalled the commit: {commit_wall:.1f}s"
    eng.flush_listeners()
    assert seen == [1, 1]
    assert len(eng.listener_errors) == 2
    assert all(isinstance(e, RuntimeError) for e in eng.listener_errors)


def test_async_listener_survives_later_version_flips(spark, workspace):
    """The queued delta must be snapshotted in-commit: later commits
    flip/compact the table's version dirs and delete the delta's
    backing parquet files, so a lazy plan evaluated by a slow drain
    thread would hit FileNotFound. The subscriber must still receive
    the original rows, with no swallowed errors."""
    import time

    eng = Engine(spark, {"tables": [{"Source": {"name": "people", "columns": {
        "name": "Str", "age": "Integer"}}}]}, workspace=workspace)
    seen = []

    def slow(df):
        time.sleep(1.5)
        seen.append(sorted(r["name"] for r in df.collect()))

    eng.listen("people", "Insert", slow, asynchronous=True)
    eng.insert("people", [{"name": "a", "age": 1}, {"name": "b", "age": 2}])
    # churn state while the drain is still asleep: delete rewrites the
    # version dir, further inserts append and may compact
    eng.delete("people", "name", "b")
    for i in range(3):
        eng.insert("people", [{"name": f"c{i}", "age": 10 + i}])
    eng.flush_listeners()
    assert eng.listener_errors == []
    assert seen[0] == ["a", "b"]
    # the later insert commits were delivered too, in order (the delete
    # commit emits no Insert event)
    assert seen == [["a", "b"], ["c0"], ["c1"], ["c2"]]


def test_bulk_async_listener_stages_off_driver(spark, workspace):
    """A bulk insert_df commit with asynchronous listeners must never
    materialize the delta on the driver: the snapshot is a staging
    parquet write (executor-side) shared by ALL async subscribers of the
    event, and the only driver-side collects during the commit are
    scalar aggregates. Guards the 100 TB contract: one commit CAN be the
    whole table."""
    import pyspark.sql.dataframe as _dfmod
    from pyspark.sql import functions as F

    eng = Engine(spark, {"tables": [{"Source": {"name": "people", "columns": {
        "name": "Str", "age": "Integer"}}}]}, workspace=workspace)
    got = []
    eng.listen("people", "Insert", lambda df: got.append(df.count()),
               asynchronous=True)
    eng.listen("people", "Insert", lambda df: got.append(df.count()),
               asynchronous=True)

    big = spark.range(100_000).select(
        F.concat(F.lit("u"), F.col("id")).alias("name"),
        F.col("id").cast("long").alias("age"),
    )
    collected_sizes = []
    orig = _dfmod.DataFrame.collect

    def spy(self):
        rows = orig(self)
        collected_sizes.append(len(rows))
        return rows

    _dfmod.DataFrame.collect = spy
    try:
        eng.insert_df("people", big)
    finally:
        _dfmod.DataFrame.collect = orig
    # scalar aggregates only — never the 100k-row delta
    assert max(collected_sizes, default=0) <= 16, collected_sizes
    eng.flush_listeners()
    assert eng.listener_errors == []
    assert got == [100_000, 100_000]
    # ONE shared snapshot for both subscribers of the same commit+event
    assert eng._listen_staged == 1


def test_listener_stage_lifetime_and_sibling_isolation(spark, workspace):
    """ADVICE r6: (a) a DataFrame RETAINED by an async callback stays
    valid until the flush_listeners() barrier (which reaps delivered
    stages); (b) a second Engine constructed over the same workspace
    must not delete a live sibling's staged snapshots; (c) stage dirs
    left by DEAD processes are reaped at the next engine init."""
    import os
    import time

    cfg = {"tables": [{"Source": {"name": "people", "columns": {
        "name": "Str", "age": "Integer"}}}]}
    eng = Engine(spark, cfg, workspace=workspace)
    retained = []
    eng.listen("people", "Insert", lambda df: retained.append(df),
               asynchronous=True)
    eng.insert("people", [{"name": "a", "age": 1}])
    for _ in range(100):
        if retained:
            break
        time.sleep(0.1)
    assert retained, "async delivery never arrived"
    # delivered but not yet flushed: the retained lazy df still evaluates
    assert retained[0].count() == 1
    stage_parent = os.path.dirname(eng._listen_stage_root)
    # (b) a second LIVE engine over the workspace leaves the sibling alone
    Engine(spark, cfg, workspace=workspace)
    assert retained[0].count() == 1
    # (c) a dead process's stage dir is reaped by the next engine init
    dead = os.path.join(stage_parent, "999999999-deadbeef")
    os.makedirs(dead, exist_ok=True)
    Engine(spark, cfg, workspace=workspace)
    assert not os.path.exists(dead)
    assert os.path.exists(eng._listen_stage_root)
    # (a) flush_listeners is the retention barrier: spent stages reaped
    eng.flush_listeners()
    assert (not os.path.exists(eng._listen_stage_root)
            or os.listdir(eng._listen_stage_root) == [])
