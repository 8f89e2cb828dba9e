"""DistinctTransform: reference-counted multi-column DISTINCT as a
config-level reactive derived table (operators/distinct_transform.py).
Counted-projection IVM: 0↔1 transitions emit child deltas, pure
refcount moves emit nothing and never read the parent; downstream
cascade, same-commit netting, NULL-distinctness, restart recovery, and
a randomized differential against a pure-python replay."""

import random
import tempfile

import pytest

from reactivedb_spark.engine import Engine
from reactivedb_spark.errors import ConfigError

CFG = {
    "tables": [
        {"Source": {"name": "ev", "columns": {
            "eid": "Integer", "user": "Str", "kind": "Str"}}},
        {"Derived": {"name": "pairs",
                     "transform_definition": {"DistinctTransform": {
                         "source_table": "ev",
                         "columns": ["user", "kind"]}}}},
        # downstream of the distinct table: births/deaths must cascade,
        # refcount-only moves must NOT
        {"Derived": {"name": "pair_tags",
                     "transform_definition": {"FunctionTransform": {
                         "source_table": "pairs",
                         "functions": ["tag ~ user + kind"]}}}},
    ]
}


@pytest.fixture()
def eng(spark):
    return Engine(spark, CFG, workspace=tempfile.mkdtemp(prefix="rdb_dst_"))


def _pairs(eng, table="pairs"):
    col = "tag" if table == "pair_tags" else None
    rows = eng.table(table).collect()
    if col:
        return sorted(r[col] for r in rows)
    return sorted(
        ((r["user"], r["kind"]) for r in rows),
        key=lambda t: (t[0] is None, t[0] or "", t[1]),
    )


def test_births_once_then_refcount_moves_are_silent(eng):
    deltas = eng.insert("ev", [
        {"eid": 1, "user": "a", "kind": "view"},
        {"eid": 2, "user": "a", "kind": "view"},   # same tuple
        {"eid": 3, "user": "b", "kind": "buy"},
    ])
    assert _pairs(eng) == [("a", "view"), ("b", "buy")]
    assert deltas["pairs"].num_inserted == 2  # one birth per tuple
    # a duplicate arrival: NO child delta at all (pure refcount move)
    deltas = eng.insert("ev", [{"eid": 4, "user": "a", "kind": "view"}])
    assert "pairs" not in deltas or deltas["pairs"] is None
    assert _pairs(eng) == [("a", "view"), ("b", "buy")]


def test_refcount_is_hidden_and_exact_identity(eng):
    eng.insert("ev", [
        {"eid": 1, "user": "X", "kind": "view"},
        {"eid": 2, "user": " x ", "kind": "view"},  # NOT normalized: distinct
    ])
    assert "_refCount" not in eng.table("pairs").columns
    assert _pairs(eng) == [(" x ", "view"), ("X", "view")]


def test_null_is_distinct_from_null_string(eng):
    eng.insert("ev", [
        {"eid": 1, "user": None, "kind": "view"},
        {"eid": 2, "user": "NULL", "kind": "view"},
        {"eid": 3, "user": None, "kind": "view"},  # refcounts under NULL too
    ])
    got = _pairs(eng)
    assert got == [("NULL", "view"), (None, "view")]
    eng.delete("ev", "eid", 1)
    assert _pairs(eng) == [("NULL", "view"), (None, "view")]
    eng.delete("ev", "eid", 3)
    assert _pairs(eng) == [("NULL", "view")]


def test_deletes_decrement_then_die_at_zero(eng):
    eng.insert("ev", [
        {"eid": 1, "user": "a", "kind": "view"},
        {"eid": 2, "user": "a", "kind": "view"},
    ])
    assert _pairs(eng, "pair_tags") == ["aview"]
    deltas = eng.delete("ev", "eid", 1)
    # refcount 2 -> 1: row survives, nothing cascades
    assert "pairs" not in deltas or deltas["pairs"] is None
    assert _pairs(eng) == [("a", "view")]
    deltas = eng.delete("ev", "eid", 2)
    # refcount 1 -> 0: death, cascades downstream
    assert deltas["pairs"].num_deleted == 1
    assert _pairs(eng) == []
    assert _pairs(eng, "pair_tags") == []


def test_same_commit_delete_insert_nets_silently(spark):
    """A dedup parent re-electing its representative emits delete+insert
    in ONE delta; the distinct child projects a column equal across the
    two reps, so the net refcount move is zero and NOTHING cascades —
    the same-commit netting the Update decomposition demands."""
    cfg = {"tables": [
        {"Source": {"name": "docs", "columns": {
            "doc_id": "Integer", "body": "Str", "grp": "Str"}}},
        {"Derived": {"name": "uniq", "transform_definition": {
            "DedupTransform": {"source_table": "docs", "key": "body"}}}},
        {"Derived": {"name": "grps", "transform_definition": {
            "DistinctTransform": {"source_table": "uniq",
                                  "columns": ["grp"]}}}},
    ]}
    eng = Engine(spark, cfg, workspace=tempfile.mkdtemp(prefix="rdb_dstn_"))
    eng.insert("docs", [
        {"doc_id": 1, "body": "k", "grp": "g1"},
        {"doc_id": 2, "body": "K", "grp": "g1"},  # same dedup key, same grp
    ])
    assert sorted(r["grp"] for r in eng.table("grps").collect()) == ["g1"]
    # deleting the rep re-elects doc 2: uniq emits delete+insert in one
    # delta; grps' 'g1' count nets 1-1+1... old=1, net=0 → silent
    deltas = eng.delete("docs", "doc_id", 1)
    assert deltas["uniq"].num_deleted == 1 and deltas["uniq"].num_inserted == 1
    assert "grps" not in deltas or deltas["grps"] is None
    assert sorted(r["grp"] for r in eng.table("grps").collect()) == ["g1"]


def test_restart_recovers_counts(spark, workspace):
    eng = Engine(spark, CFG, workspace=workspace)
    eng.insert("ev", [
        {"eid": 1, "user": "a", "kind": "view"},
        {"eid": 2, "user": "a", "kind": "view"},
        {"eid": 3, "user": "b", "kind": "buy"},
    ])
    eng2 = Engine(spark, CFG, workspace=workspace)
    # counts survived: one delete still leaves 'a/view' alive
    eng2.delete("ev", "eid", 1)
    assert _pairs(eng2) == [("a", "view"), ("b", "buy")]
    eng2.delete("ev", "eid", 2)
    assert _pairs(eng2) == [("b", "buy")]


def test_config_errors(spark):
    bad_col = {"tables": [
        {"Source": {"name": "t", "columns": {"a": "Integer"}}},
        {"Derived": {"name": "d", "transform_definition": {
            "DistinctTransform": {"source_table": "t", "columns": ["nope"]}}}},
    ]}
    with pytest.raises(ConfigError, match="not in parent schema"):
        Engine(spark, bad_col, workspace=tempfile.mkdtemp())
    dup_col = {"tables": [
        {"Source": {"name": "t", "columns": {"a": "Integer"}}},
        {"Derived": {"name": "d", "transform_definition": {
            "DistinctTransform": {"source_table": "t", "columns": ["a", "a"]}}}},
    ]}
    with pytest.raises(ConfigError, match="duplicate"):
        Engine(spark, dup_col, workspace=tempfile.mkdtemp())
    empty = {"tables": [
        {"Source": {"name": "t", "columns": {"a": "Integer"}}},
        {"Derived": {"name": "d", "transform_definition": {
            "DistinctTransform": {"source_table": "t", "columns": []}}}},
    ]}
    with pytest.raises(ConfigError, match=">=1 column"):
        Engine(spark, empty, workspace=tempfile.mkdtemp())


@pytest.mark.parametrize("seed", [31, 32])
def test_randomized_differential_maintenance(spark, seed):
    """Random interleaving of inserts and deletes vs a pure-python
    counted-set replay — membership must match after every commit."""
    rng = random.Random(seed)
    eng = Engine(spark, CFG, workspace=tempfile.mkdtemp(prefix="rdb_dstr_"))
    live = {}   # eid -> (user, kind)
    counts = {}
    eid = 0
    for step in range(6):
        if live and rng.random() < 0.4:
            victim = rng.choice(sorted(live))
            u, k = live.pop(victim)
            counts[(u, k)] -= 1
            if counts[(u, k)] == 0:
                del counts[(u, k)]
            eng.delete("ev", "eid", victim)
        else:
            rows = []
            for _ in range(rng.randint(1, 4)):
                eid += 1
                u = rng.choice(["a", "b", "c"])
                k = rng.choice(["view", "buy"])
                rows.append({"eid": eid, "user": u, "kind": k})
                live[eid] = (u, k)
                counts[(u, k)] = counts.get((u, k), 0) + 1
            eng.insert("ev", rows)
        assert _pairs(eng) == sorted(counts), f"step {step}"
