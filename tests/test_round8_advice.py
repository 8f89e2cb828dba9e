"""Round-8 ADVICE regression tests: TopKTransform NULL ordering,
ks_pairs integral contract, seed_assignments2 small-corpus clamp,
JoinTransform key-type config error, and listener-stage hygiene
(timestamped dirs, age-based reaping, commit-boundary backlog reap)."""

import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from reactivedb_spark.config import parse_config
from reactivedb_spark.engine import Engine
from reactivedb_spark.errors import ConfigError


# -- TopKTransform: NULL order_by ranks LAST in both directions --------

def _topk_cfg(descending):
    return {"tables": [
        {"Source": {"name": "scores", "columns": {
            "player": "Integer", "team": "Str", "points": "Integer"}}},
        {"Derived": {"name": "leaders",
                     "transform_definition": {"TopKTransform": {
                         "source_table": "scores", "group_by": "team",
                         "order_by": "points", "k": 2,
                         "descending": descending}}}},
    ]}


@pytest.mark.parametrize("descending", [False, True])
def test_topk_null_order_by_never_fills_slots(spark, descending):
    eng = Engine(spark, _topk_cfg(descending),
                 workspace=tempfile.mkdtemp(prefix="rdb_tknull_"))
    eng.insert("scores", [
        {"player": 1, "team": "a", "points": None},
        {"player": 2, "team": "a", "points": None},
        {"player": 3, "team": "a", "points": 7},
        {"player": 4, "team": "a", "points": 3},
        {"player": 5, "team": "a", "points": 5},
    ])
    got = {r["player"] for r in eng.table("leaders").collect()}
    # ascending keeps the two LOWEST real values; descending the two
    # highest — NULLs rank last either way (ADVICE r7: Spark's plain
    # asc would rank NULLs first and hand them the k slots).
    assert got == ({4, 5} if not descending else {3, 5})


def test_topk_null_rows_surface_when_real_values_run_out(spark):
    eng = Engine(spark, _topk_cfg(False),
                 workspace=tempfile.mkdtemp(prefix="rdb_tknull2_"))
    eng.insert("scores", [
        {"player": 1, "team": "a", "points": None},
        {"player": 2, "team": "a", "points": 9},
    ])
    got = {r["player"] for r in eng.table("leaders").collect()}
    assert got == {1, 2}  # k=2, only one real value: NULL row fills #2


# -- ks_pairs: integral-column contract ---------------------------------

def test_ks_pairs_rejects_non_integral_column(spark):
    from reactivedb_spark.operators.numeric import ks_pairs

    df = spark.createDataFrame(
        [("a", 1.5), ("b", 2.5)], "g string, x double")
    with pytest.raises(TypeError, match="not integral"):
        ks_pairs(df, "g", "x")


def test_ks_pairs_accepts_int_column(spark):
    from reactivedb_spark.operators.numeric import ks_pairs

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), ("b", 4)], "g string, x int")
    [r] = ks_pairs(df, "g", "x").collect()
    assert r["ks"] == 1.0


# -- seed_assignments2: corpus smaller than k / sqrt(k) ------------------

def test_seed_assignments2_clamps_k_to_corpus(spark):
    from reactivedb_spark.operators.similarity import seed_assignments2

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "id long, emb array<double>")
    assign = seed_assignments2(df, "id", "emb", n_clusters=16)
    rows = assign.collect()
    assert len(rows) == 3  # every row assigned, no IndexError
    assert {r["cluster"] for r in rows} <= {0, 1, 2}


def test_seed_assignments2_empty_corpus_raises(spark):
    from reactivedb_spark.operators.similarity import seed_assignments2

    df = spark.createDataFrame([], "id long, emb array<double>")
    with pytest.raises(ValueError, match="empty"):
        seed_assignments2(df, "id", "emb", n_clusters=4)


# -- ivf_assignments: large k routes off the literal-array path ----------

def test_ivf_assignments_paths_agree(spark, monkeypatch):
    import reactivedb_spark.operators.similarity as sim

    df = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11) for j in range(4)])
         for i in range(40)],
        "id long, emb array<double>")
    lit_rows = sorted(
        (r["id"], r["cluster"])
        for r in sim.ivf_assignments(df, "id", "emb", k=4)[0].collect())
    monkeypatch.setattr(sim, "_IVF_LITERAL_MAX_TERMS", 1)  # force join path
    join_rows = sorted(
        (r["id"], r["cluster"])
        for r in sim.ivf_assignments(df, "id", "emb", k=4)[0].collect())
    assert lit_rows == join_rows


def test_ivf_assignments_k1024_uses_join_not_literal_tree(spark):
    from reactivedb_spark.operators.similarity import ivf_assignments

    df = spark.createDataFrame(
        [(i, [float((i * 13 + j) % 17) for j in range(16)])
         for i in range(1030)],
        "id long, emb array<double>")
    assign, cents = ivf_assignments(df, "id", "emb", k=1024, iters=1)
    assert len(cents) == 1024
    # the join path's plan is join-shaped and BOUNDED — no k·dim literal
    # expression tree (k=1024·d=16 would inline 16384 literals)
    plan = assign._jdf.queryExecution().analyzed().toString()
    assert len(plan) < 200_000
    assert assign.count() == 1030


# -- JoinTransform: key type mismatch is a ConfigError -------------------

def test_join_transform_key_type_mismatch_is_config_error(spark):
    cfg = {"tables": [
        {"Source": {"name": "l", "columns": {"k": "Integer", "v": "Str"}}},
        {"Source": {"name": "r", "columns": {"k2": "Str", "w": "Integer"}}},
        {"Derived": {"name": "j", "transform_definition": {
            "JoinTransform": {"left_table": "l", "right_table": "r",
                              "left_on": "k", "right_on": "k2"}}}},
    ]}
    with pytest.raises(ConfigError, match="type mismatch"):
        Engine(spark, cfg, workspace=tempfile.mkdtemp(prefix="rdb_jtm_"))


# -- Listener staging hygiene --------------------------------------------

_SRC_CFG = {"tables": [
    {"Source": {"name": "t", "columns": {"a": "Integer"}}},
]}


def test_stage_dir_name_carries_pid_and_epoch(spark, tmp_path):
    ws = str(tmp_path / "ws")
    eng = Engine(spark, _SRC_CFG, workspace=ws)
    leaf = os.path.basename(eng._listen_stage_root)
    pid_s, ts_s = leaf.split("-")[0], leaf.split("-")[1]
    assert int(pid_s) == os.getpid()
    assert abs(int(ts_s) - time.time()) < 300


def test_aged_stage_dir_reaped_despite_live_pid(spark, tmp_path):
    ws = str(tmp_path / "ws")
    parent = os.path.join(ws, "_listen_stage")
    os.makedirs(parent)
    # our OWN (alive) pid but a 2-day-old embedded epoch: PID-reuse case
    stale = os.path.join(
        parent, f"{os.getpid()}-{int(time.time()) - 2 * 86400}-deadbeef")
    os.makedirs(stale)
    fresh = os.path.join(
        parent, f"{os.getpid()}-{int(time.time())}-cafecafe")
    os.makedirs(fresh)
    Engine(spark, _SRC_CFG, workspace=ws)
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)


def test_spent_stage_backlog_reaped_at_commit_boundary(spark, tmp_path,
                                                       monkeypatch):
    import reactivedb_spark.engine as eng_mod

    monkeypatch.setattr(eng_mod, "_SPENT_STAGE_REAP", 2)
    ws = str(tmp_path / "ws")
    eng = Engine(spark, _SRC_CFG, workspace=ws)
    eng.listen("t", "Insert", lambda df: df.count(), asynchronous=True)
    for i in range(5):
        eng.insert("t", [{"a": i}])
        eng._dispatch_q.join()  # delivery done, NO flush: backlog grows
    # the 5th commit saw a backlog of 4 > 2 and reaped the oldest two
    assert len(eng._spent_stages) <= 3
    for p in eng._spent_stages:
        assert os.path.exists(p)  # survivors still readable
    eng.flush_listeners()
    assert not eng._spent_stages
    assert not eng.listener_errors
