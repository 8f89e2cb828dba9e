"""TopKTransform: incrementally maintained per-group top-k as a
config-level reactive derived table (operators/topk_transform.py).
Insert-path eviction (delta displaces a member → cascading child
delete), delete-path refill from the parent, tie-breaks by arrival,
and the downstream cascade through a dependent transform."""

import tempfile

import pytest

from reactivedb_spark.config import parse_config
from reactivedb_spark.engine import Engine
from reactivedb_spark.errors import ConfigError

CFG = {
    "tables": [
        {"Source": {"name": "scores", "columns": {
            "player": "Integer", "team": "Str", "points": "Integer"}}},
        {"Derived": {"name": "leaders",
                     "transform_definition": {"TopKTransform": {
                         "source_table": "scores", "group_by": "team",
                         "order_by": "points", "k": 2}}}},
        # downstream of the top-k table: evictions must cascade through
        {"Derived": {"name": "leader_names",
                     "transform_definition": {"FunctionTransform": {
                         "source_table": "leaders",
                         "functions": ["p ~ player", "t ~ team"]}}}},
    ]
}


@pytest.fixture()
def eng(spark):
    return Engine(spark, CFG, workspace=tempfile.mkdtemp(prefix="rdb_topk_"))


def _members(eng, table="leaders"):
    tcol, pcol = ("t", "p") if table == "leader_names" else ("team", "player")
    out = {}
    for r in eng.table(table).collect():
        out.setdefault(r[tcol], set()).add(r[pcol])
    return out


def test_insert_maintains_topk_with_eviction(eng):
    eng.insert("scores", [
        {"player": 1, "team": "a", "points": 10},
        {"player": 2, "team": "a", "points": 20},
        {"player": 3, "team": "b", "points": 5},
    ])
    assert _members(eng) == {"a": {1, 2}, "b": {3}}
    # 30 displaces player 1 (10): child delete + insert in one commit
    deltas = eng.insert("scores", [{"player": 4, "team": "a", "points": 30}])
    assert _members(eng) == {"a": {2, 4}, "b": {3}}
    d = deltas["leaders"]
    assert d.inserts is not None and d.deletes is not None
    assert [r["player"] for r in d.deletes.collect()] == [1]
    # below-k arrival changes nothing
    deltas = eng.insert("scores", [{"player": 5, "team": "a", "points": 1}])
    assert "leaders" not in deltas or deltas["leaders"] is None
    assert _members(eng) == {"a": {2, 4}, "b": {3}}


def test_eviction_cascades_downstream(eng):
    eng.insert("scores", [
        {"player": 1, "team": "a", "points": 10},
        {"player": 2, "team": "a", "points": 20},
    ])
    eng.insert("scores", [{"player": 3, "team": "a", "points": 30}])
    assert _members(eng, "leader_names") == {"a": {2, 3}}


def test_delete_refills_from_parent(eng):
    eng.insert("scores", [
        {"player": 1, "team": "a", "points": 10},
        {"player": 2, "team": "a", "points": 20},
        {"player": 3, "team": "a", "points": 30},
        {"player": 4, "team": "a", "points": 40},
    ])
    assert _members(eng) == {"a": {3, 4}}
    # deleting a member promotes the best below-k parent row (3 stays!)
    eng.delete("scores", "player", 4)
    assert _members(eng) == {"a": {2, 3}}
    assert _members(eng, "leader_names") == {"a": {2, 3}}
    # deleting a non-member parent row changes nothing
    eng.delete("scores", "player", 1)
    assert _members(eng) == {"a": {2, 3}}
    # group can shrink below k
    eng.delete("scores", "player", 2)
    eng.delete("scores", "player", 3)
    assert _members(eng) == {}


def test_ties_break_by_arrival_order(eng):
    eng.insert("scores", [{"player": 1, "team": "a", "points": 7}])
    eng.insert("scores", [{"player": 2, "team": "a", "points": 7}])
    eng.insert("scores", [{"player": 3, "team": "a", "points": 7}])
    # k=2: the two EARLIEST arrivals of the tied value hold the slots
    assert _members(eng) == {"a": {1, 2}}


def test_ascending_variant_and_config_errors(spark):
    cfg = {
        "tables": [
            {"Source": {"name": "s", "columns": {"g": "Str", "v": "Integer"}}},
            {"Derived": {"name": "bottom1",
                         "transform_definition": {"TopKTransform": {
                             "source_table": "s", "group_by": "g",
                             "order_by": "v", "k": 1,
                             "descending": False}}}},
        ]
    }
    eng = Engine(spark, cfg, workspace=tempfile.mkdtemp(prefix="rdb_topka_"))
    eng.insert("s", [{"g": "x", "v": 9}, {"g": "x", "v": 3}, {"g": "x", "v": 5}])
    assert [r["v"] for r in eng.table("bottom1").collect()] == [3]
    eng.insert("s", [{"g": "x", "v": 1}])
    assert [r["v"] for r in eng.table("bottom1").collect()] == [1]

    with pytest.raises(ConfigError):
        parse_config({"tables": [
            {"Source": {"name": "s", "columns": {"g": "Str", "v": "Integer"}}},
            {"Derived": {"name": "t", "transform_definition": {
                "TopKTransform": {"source_table": "s", "group_by": "g",
                                  "order_by": "v", "k": 0}}}},
        ]})
    with pytest.raises(ConfigError):
        Engine(spark, {"tables": [
            {"Source": {"name": "s", "columns": {"g": "Str", "v": "Integer"}}},
            {"Derived": {"name": "t", "transform_definition": {
                "TopKTransform": {"source_table": "s", "group_by": "nope",
                                  "order_by": "v", "k": 1}}}},
        ]}, workspace=tempfile.mkdtemp(prefix="rdb_topke_"))


def test_restart_recovers_topk_state(spark):
    ws = tempfile.mkdtemp(prefix="rdb_topkr_")
    eng = Engine(spark, CFG, workspace=ws)
    eng.insert("scores", [
        {"player": 1, "team": "a", "points": 10},
        {"player": 2, "team": "a", "points": 20},
        {"player": 3, "team": "a", "points": 30},
    ])
    del eng
    eng2 = Engine(spark, CFG, workspace=ws)
    assert _members(eng2) == {"a": {2, 3}}
    # maintenance continues across the restart: eviction + refill
    eng2.insert("scores", [{"player": 4, "team": "a", "points": 40}])
    assert _members(eng2) == {"a": {3, 4}}
    eng2.delete("scores", "player", 4)
    assert _members(eng2) == {"a": {2, 3}}


def test_randomized_waves_match_recompute(spark):
    """Differential check: a seeded random sequence of insert/delete
    waves through the engine must leave the derived table equal to a
    from-scratch top-k recomputation over the surviving rows with the
    same (points desc, arrival) rank — the incremental path may never
    diverge from the batch definition."""
    import random

    rng = random.Random(42)
    eng = Engine(spark, CFG, workspace=tempfile.mkdtemp(prefix="rdb_topkp_"))
    live = {}  # player -> (team, points, arrival)
    arrival = 0
    next_id = 0
    for _wave in range(5):
        batch = []
        for _ in range(rng.randint(3, 8)):
            batch.append({"player": next_id,
                          "team": rng.choice(["a", "b", "c"]),
                          "points": rng.randint(0, 9)})  # ties likely
            next_id += 1
        for row in batch:
            live[row["player"]] = (row["team"], row["points"], arrival)
            arrival += 1
        eng.insert("scores", batch)
        for pid in rng.sample(sorted(live), k=min(2, len(live))):
            del live[pid]
            eng.delete("scores", "player", pid)
        expected = {}
        by_team = {}
        for pid, (team, pts, arr) in live.items():
            by_team.setdefault(team, []).append((-pts, arr, pid))
        for team, rows in by_team.items():
            expected[team] = {pid for _, _, pid in sorted(rows)[:2]}
        got = _members(eng)
        assert got == {t: m for t, m in expected.items() if m}, \
            f"diverged after wave {_wave}"
