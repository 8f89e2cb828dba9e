"""Round-10 additions: DSIR resampling (Gumbel-top-k consumption of the
importance weights), the insert-report cascade-response contract, the
txn-rollback census, and the listener fan-out scale contract (one staged
snapshot per (table, event, commit) regardless of subscriber count)."""

import tempfile

from pyspark.sql import functions as F

from reactivedb_spark.engine import Engine


def _docs(spark, n=40):
    rows = [(i, f"tok{i % 7} tok{i % 3} tok{i % 11}",
             "en" if i % 2 == 0 else "fr") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_dsir_resample_budget_and_consistency(spark):
    from reactivedb_spark.operators.importance import (
        dsir_log_weights, dsir_resample)

    d = _docs(spark)
    sel = dsir_resample(d, "doc_id", "text", F.col("lang") == "en",
                        budget=10, n_buckets=32)
    rows = sel.collect()
    assert len(rows) == 10
    # selected (doc_id, log_w) must be a subset of the weight table
    w = {r["doc_id"]: r["log_w"] for r in dsir_log_weights(
        d, "doc_id", "text", F.col("lang") == "en", n_buckets=32).collect()}
    for r in rows:
        assert w[r["doc_id"]] == r["log_w"]
    # deterministic: a re-run selects the identical set
    again = {r["doc_id"] for r in dsir_resample(
        d, "doc_id", "text", F.col("lang") == "en",
        budget=10, n_buckets=32).collect()}
    assert again == {r["doc_id"] for r in rows}


def test_dsir_resample_budget_larger_than_corpus(spark):
    from reactivedb_spark.operators.importance import dsir_resample

    d = _docs(spark, n=5)
    assert dsir_resample(d, "doc_id", "text", F.col("lang") == "en",
                         budget=100, n_buckets=16).count() == 5


def test_dsir_resample_tilts_toward_target(spark):
    """Docs sharing the target's vocabulary must be selected ahead of
    off-domain docs when the budget is tight."""
    from reactivedb_spark.operators.importance import dsir_resample

    rows = ([(i, "alpha beta gamma", "en") for i in range(20)]
            + [(100 + i, "zog qux blarp", "xx") for i in range(20)])
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    sel = {r["doc_id"] for r in dsir_resample(
        d, "doc_id", "text", F.col("lang") == "en",
        budget=12, n_buckets=64).collect()}
    # Gumbel noise is bounded below the log-weight gap here: every pick
    # must come from the on-domain block
    assert all(i < 100 for i in sel)


def test_insert_report_cascade_response(spark):
    """database.rs:189-194 semantics: the returned report carries one
    delta per TOUCHED table; the aggregation upsert reports
    delete(old)+insert(new) for keys the first commit created."""
    cfg = {
        "tables": [
            {"Source": {"name": "t", "columns": {
                "k": "Integer", "v": "Integer"}}},
            {"Derived": {"name": "pos",
                         "transform_definition": {"FilterTransform": {
                             "source_table": "t", "filter": "v > 0"}}}},
            {"Derived": {"name": "sums",
                         "transform_definition": {"AggregationTransform": {
                             "source_table": "pos",
                             "aggregated_column": "k",
                             "functions": ["total ~ memo.total + v"]}}}},
        ]
    }
    import shutil

    ws = tempfile.mkdtemp(prefix="rdb_t10_")
    try:
        eng = Engine(spark, cfg, workspace=ws)
        eng.insert("t", [{"k": 1, "v": 5}, {"k": 2, "v": -1}])
        rep = eng.insert("t", [{"k": 1, "v": 7}, {"k": 3, "v": -9}])
        assert rep["t"].num_inserted == 2 and rep["t"].num_deleted == 0
        # only k=1,v=7 passes the filter
        assert rep["pos"].num_inserted == 1
        # k=1 existed in sums -> upsert = delete old + insert new
        assert rep["sums"].num_inserted == 1 and rep["sums"].num_deleted == 1
        # an insert whose cascade reaches nothing new: only touched tables
        rep2 = eng.insert("t", [{"k": 9, "v": -2}])
        assert set(rep2) == {"t"}
    finally:
        shutil.rmtree(ws, ignore_errors=True)


def test_listen_fanout_stages_once_per_commit_event(spark):
    """The scale contract behind q_listen_fanout: staging work is
    O(delta) — ONE snapshot per (table, event, commit) shared by all
    subscribers, never one per subscriber."""
    cfg = {
        "tables": [
            {"Source": {"name": "t", "columns": {
                "k": "Integer", "v": "Integer"}}},
        ]
    }
    import shutil

    ws = tempfile.mkdtemp(prefix="rdb_t10f_")
    try:
        eng = Engine(spark, cfg, workspace=ws)
        seen = []
        for i in range(32):
            eng.listen("t", "Insert",
                       (lambda i: lambda df: seen.append(i))(i),
                       asynchronous=True)
        eng.insert("t", [{"k": 1, "v": 1}])
        eng.insert("t", [{"k": 2, "v": 2}])
        eng.flush_listeners()
        assert not eng.listener_errors
        assert sorted(seen) == sorted(list(range(32)) * 2)  # every sub, both
        assert eng._listen_staged == 2  # one snapshot per commit, NOT x32
    finally:
        shutil.rmtree(ws, ignore_errors=True)


def test_concurrent_commits_serialize(spark):
    """Commits from concurrent threads must serialize on the engine's
    commit lock (the reference's TransactionManager semantics): the
    store's single in-flight txn slot would be corrupted by interleaved
    begin_commit calls. All rows from all threads must land, and the
    derived filter must agree exactly."""
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    cfg = {
        "tables": [
            {"Source": {"name": "t", "columns": {
                "k": "Integer", "v": "Integer"}}},
            {"Derived": {"name": "pos",
                         "transform_definition": {"FilterTransform": {
                             "source_table": "t", "filter": "v > 0"}}}},
        ]
    }
    ws = tempfile.mkdtemp(prefix="rdb_t10c_")
    try:
        eng = Engine(spark, cfg, workspace=ws)

        def wave(base):
            eng.insert("t", [{"k": base + i, "v": (base + i) - 8}
                             for i in range(4)])

        with ThreadPoolExecutor(max_workers=4) as ex:
            list(ex.map(wave, [0, 10, 20, 30]))
        assert eng.table("t").count() == 16
        got = sorted(r["k"] for r in eng.table("pos").collect())
        want = sorted(k for b in (0, 10, 20, 30)
                      for k in range(b, b + 4) if k - 8 > 0)
        assert got == want
    finally:
        shutil.rmtree(ws, ignore_errors=True)


def test_reentrant_sync_listener_commit_raises(spark):
    """A SYNC listener mutating the engine during delivery is a
    re-entrant commit — must raise loudly instead of corrupting the
    in-flight txn slot (or deadlocking on the commit lock)."""
    import shutil

    cfg = {"tables": [
        {"Source": {"name": "t", "columns": {"k": "Integer"}}},
    ]}
    ws = tempfile.mkdtemp(prefix="rdb_t10r_")
    try:
        eng = Engine(spark, cfg, workspace=ws)
        errs = []

        def evil(df):
            try:
                eng.insert("t", [{"k": 999}])
            except RuntimeError as e:
                errs.append(str(e))

        eng.listen("t", "Insert", evil)
        eng.insert("t", [{"k": 1}])
        assert errs and "re-entrant commit" in errs[0]
        assert eng.table("t").count() == 1  # the evil insert never landed
    finally:
        shutil.rmtree(ws, ignore_errors=True)
