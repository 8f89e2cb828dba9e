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


class TestCompactionDeferral:
    def test_delta_survives_compaction_plus_replace_in_one_commit(self, spark, workspace):
        """Auto-compaction must not run mid-commit: if it did, a later
        replace() in the same commit would queue the dir holding the
        returned delta files in pending_rm, and end_commit would delete it
        under the DataFrame handed to listeners."""
        from pyspark.sql import types as T

        from reactivedb_spark.store import ParquetSnapshotStore

        schema = T.StructType([T.StructField("x", T.LongType())])
        st = ParquetSnapshotStore(spark, workspace, compact_threshold=2)
        st.init_table("t", schema)
        base = spark.createDataFrame([(i,) for i in range(3)], schema)
        # three appends → over threshold
        for _ in range(3):
            st.append_delta("t", base)

        st.begin_commit()
        delta, n = st.append_delta("t", base)  # queues deferred compaction
        assert n == 3
        # same-commit mutation flips the version (union/agg state rewrite)
        st.replace("t", st.read("t"))
        st.end_commit()
        # the delta handed out before the replace must still be readable
        assert delta.count() == 3
        # table intact
        assert st.read("t").count() == 12

    def test_deferred_compaction_runs_when_version_stable(self, spark, workspace):
        import os

        from pyspark.sql import types as T

        from reactivedb_spark.store import ParquetSnapshotStore

        schema = T.StructType([T.StructField("x", T.LongType())])
        st = ParquetSnapshotStore(spark, workspace + "_c", compact_threshold=2)
        st.init_table("t", schema)
        base = spark.createDataFrame([(i,) for i in range(3)], schema)
        st.begin_commit()
        for _ in range(4):
            delta, _n = st.append_delta("t", base)
        st.end_commit()  # no replace during commit → compaction happens here
        path = st._dir("t")
        files = [f for f in os.listdir(path) if f.endswith(".parquet")]
        assert len(files) <= 2, files
        assert st.read("t").count() == 12


class TestRollbackReadCache:
    def test_rollback_invalidates_read_memo(self, spark, workspace):
        """A mid-commit read() memoizes (table, version, file-count) with a
        file listing that includes the appended file. Rollback deletes that
        file; the next insert appends exactly one file again, recreating the
        SAME memo key over a different file set. The memo must not serve the
        stale listing (dead file → FileNotFoundException, new file missing)."""
        from pyspark.sql import types as T

        from reactivedb_spark.store import ParquetSnapshotStore

        schema = T.StructType([T.StructField("x", T.LongType())])
        st = ParquetSnapshotStore(spark, workspace + "_rbc")
        st.init_table("t", schema)

        st.begin_commit()
        st.append_delta("t", spark.createDataFrame([(1,)], schema))
        assert [r.x for r in st.read("t").collect()] == [1]  # populates memo
        st.rollback()

        st.begin_commit()
        st.append_delta("t", spark.createDataFrame([(2,)], schema))
        st.end_commit()
        # same (table, version, n_files=1) key — must see the NEW file
        assert [r.x for r in st.read("t").collect()] == [2]


class TestTimeTravel:
    def test_read_at_previous_version(self, spark, workspace):
        """One generation of snapshot time travel: after a version flip
        the prior snapshot stays readable at current-1."""
        from pyspark.sql import types as T

        from reactivedb_spark.store import ParquetSnapshotStore

        store = ParquetSnapshotStore(spark, workspace)
        schema = T.StructType([T.StructField("x", T.LongType())])
        store.init_table("t", schema)
        store.replace("t", spark.range(3).select(F_col_x()))
        v1 = store.current_version("t")
        store.replace("t", spark.range(10).select(F_col_x()))
        v2 = store.current_version("t")
        assert v2 == v1 + 1
        assert store.read_at("t", v2).count() == 10
        assert store.read_at("t", v1).count() == 3
        import pytest as _pytest

        with _pytest.raises(ValueError):
            store.read_at("t", v1 - 1)


def F_col_x():
    from pyspark.sql import functions as F

    return F.col("id").alias("x")


class TestCrashRecovery:
    def test_kill_between_bucket_write_and_pointer_flip(self, spark, tmp_path):
        """Fault injection (VERDICT r11 #4): a subprocess engine commits a
        baseline, then dies (os._exit) INSIDE its second commit — after
        every staged/appended bucket write and in-memory version flip,
        but before the durable meta.json pointer flip. A fresh engine
        over the same workspace must read the pre-crash committed state
        for EVERY table, reap the orphan staging tree, and hold no
        version dirs beyond the committed pointers."""
        import json
        import os
        import subprocess
        import sys

        ws = str(tmp_path / "ws")
        child = os.path.join(os.path.dirname(__file__), "crash_commit_child.py")
        proc = subprocess.run(
            [sys.executable, child, ws],
            capture_output=True, text=True, timeout=600)
        assert proc.returncode == 42, proc.stderr[-2000:]

        tables_root = os.path.join(ws, "tables")
        # the crashed commit left orphans on disk that meta does not see
        with open(os.path.join(tables_root, "meta.json")) as f:
            meta = json.load(f)
        orphans = []
        for name, version in meta["versions"].items():
            tdir = os.path.join(tables_root, name)
            cur = os.path.join(tdir, f"v{int(version):06d}")
            on_disk = set()
            for root, _d, fs in os.walk(cur):
                for fname in fs:
                    if fname.endswith(".parquet"):
                        rel = os.path.relpath(os.path.join(root, fname), cur)
                        on_disk.add(rel)
            extra_files = on_disk - set(meta["files"][name])
            extra_dirs = [d for d in os.listdir(tdir)
                          if d.startswith("v") and d[1:].isdigit()
                          and int(d[1:]) > int(version)] if os.path.isdir(tdir) else []
            if extra_files or extra_dirs:
                orphans.append(name)
        assert orphans, "crash left no orphans — the injection missed the window"

        from tests.crash_commit_child import CFG

        eng = Engine(spark, CFG, workspace=ws)
        # pre-commit state for EVERY table: baseline rows only
        users = {(r["uid"], r["score"]) for r in eng.table("users").collect()}
        assert users == {(1, 5), (2, 50)}
        big = {(r["uid"], r["score"]) for r in eng.table("big").collect()}
        assert big == {(2, 50)}
        totals = {(r["aggregatedColumn"], r["n"])
                  for r in eng.table("totals").collect()}
        assert totals == {(1, 1), (2, 1)}
        # orphan staging reaped
        assert not os.path.isdir(os.path.join(tables_root, "_staging"))
        # no version dirs beyond (or more than one behind) the committed pointer
        for name, version in meta["versions"].items():
            tdir = os.path.join(tables_root, name)
            if not os.path.isdir(tdir):
                continue
            vs = sorted(int(d[1:]) for d in os.listdir(tdir)
                        if d.startswith("v") and d[1:].isdigit())
            assert all(int(version) - 1 <= v <= int(version) for v in vs), (name, vs)
        # and no orphan files inside any current version dir
        for name, version in meta["versions"].items():
            cur = os.path.join(tables_root, name, f"v{int(version):06d}")
            on_disk = set()
            for root, _d, fs in os.walk(cur):
                for fname in fs:
                    if fname.endswith(".parquet"):
                        on_disk.add(os.path.relpath(os.path.join(root, fname), cur))
            assert on_disk <= set(meta["files"][name]), name

        # the recovered engine stays fully usable: the lost commit can be
        # replayed and cascades as if the crash never happened
        eng.insert("users", [{"uid": 3, "score": 99}, {"uid": 1, "score": 7}])
        assert eng.table("users").count() == 4
        assert {(r["uid"], r["score"]) for r in eng.table("big").collect()} == \
            {(2, 50), (3, 99)}
        assert {(r["aggregatedColumn"], r["n"])
                for r in eng.table("totals").collect()} == \
            {(1, 2), (2, 1), (3, 1)}


class TestCrashStreamListen:
    """VERDICT r12 #5: crash-injection with ACTIVE listeners and a
    RUNNING checkpointed stream. Two kill windows (crash_stream_child):
    A — between bucket write and pointer flip (commit not durable,
    checkpoint marker absent); B — after the commit+epoch note, before
    the checkpoint marker (the double-apply window). Asserted on
    reattach: exact pre-crash snapshot, no phantom/duplicate listener
    events, and an exactly-once resume from the SAME checkpoint."""

    @staticmethod
    def _run_child(ws, mode, expect_rc):
        import os
        import subprocess
        import sys

        child = os.path.join(os.path.dirname(__file__), "crash_stream_child.py")
        proc = subprocess.run([sys.executable, child, ws, mode],
                              capture_output=True, text=True, timeout=600)
        assert proc.returncode == expect_rc, proc.stderr[-3000:]

    @staticmethod
    def _events(ws, name):
        import json
        import os

        path = os.path.join(ws, name)
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def _resume(self, spark, ws):
        import os

        from tests.crash_stream_child import (
            CFG, attach_logger, run_available_now)

        eng = Engine(spark, CFG, workspace=ws)
        attach_logger(eng, ws, "listen_log2.jsonl")
        run_available_now(eng, spark, os.path.join(ws, "stream_src"),
                          os.path.join(ws, "ckpt"))
        return eng

    def test_kill_before_pointer_flip_replays_exactly_once(self, spark, tmp_path):
        ws = str(tmp_path / "wsA")
        self._run_child(ws, "A", 42)

        # pre-crash snapshot: batch 1 only, and the dead commit produced
        # ZERO listener events (notification is strictly post-commit)
        ev1 = self._events(ws, "listen_log.jsonl")
        assert {(e["table"], e["uid"]) for e in ev1} == \
            {("users", 1), ("users", 2), ("big", 2)}
        assert len(ev1) == 3, ev1

        eng = self._resume(spark, ws)
        users = sorted((r["uid"], r["score"]) for r in eng.table("users").collect())
        assert users == [(1, 5), (2, 50), (3, 99), (4, 7)] or \
            users == sorted([(1, 5), (2, 50), (3, 99), (4, 7)])
        big = sorted((r["uid"], r["score"]) for r in eng.table("big").collect())
        assert big == [(2, 50), (3, 99)]
        # the replayed batch's events fire exactly once, in the resume
        ev2 = self._events(ws, "listen_log2.jsonl")
        assert sorted((e["table"], e["uid"]) for e in ev2) == \
            [("big", 3), ("users", 3), ("users", 4)]

    def test_kill_before_checkpoint_marker_skips_replay(self, spark, tmp_path):
        ws = str(tmp_path / "wsB")
        self._run_child(ws, "B", 43)

        # the commit WAS durable: both batches on disk, events exactly once
        ev1 = self._events(ws, "listen_log.jsonl")
        assert sorted((e["table"], e["uid"]) for e in ev1) == \
            [("big", 2), ("big", 3), ("users", 1), ("users", 2),
             ("users", 3), ("users", 4)]

        eng = self._resume(spark, ws)
        users = sorted((r["uid"], r["score"]) for r in eng.table("users").collect())
        assert users == [(1, 5), (2, 50), (3, 99), (4, 7)], \
            "replayed epoch was double-applied"
        big = sorted((r["uid"], r["score"]) for r in eng.table("big").collect())
        assert big == [(2, 50), (3, 99)]
        # the ledger skipped the replay BEFORE any insert: zero new events
        assert self._events(ws, "listen_log2.jsonl") == []
