"""JoinTransform (extension): incrementally maintained inner equi-join
derived table — delta inserts from either side, cascading deletes via
both provenance columns, and the declared config-time rejections
(self-join, shared ancestry, column collision)."""

import pytest

from reactivedb_spark.engine import Engine
from reactivedb_spark.errors import ConfigError


def _cfg():
    return {"tables": [
        {"Source": {"name": "ord", "columns": {
            "okey": "Integer", "ckey": "Integer"}}},
        {"Source": {"name": "cust", "columns": {
            "cust_id": "Integer", "cname": "Str"}}},
        {"Derived": {"name": "joined", "transform_definition": {
            "JoinTransform": {"left_table": "ord", "right_table": "cust",
                              "left_on": "ckey", "right_on": "cust_id"}}}},
    ]}


def _rows(eng):
    return sorted(
        (r["okey"], r["ckey"], r["cname"])
        for r in eng.table("joined").select("okey", "ckey", "cname").collect()
    )


def test_incremental_inserts_both_sides(spark, workspace):
    eng = Engine(spark, _cfg(), workspace=workspace)
    eng.insert("cust", [{"cust_id": 1, "cname": "a"}, {"cust_id": 2, "cname": "b"}])
    assert _rows(eng) == []  # no left rows yet
    eng.insert("ord", [{"okey": 10, "ckey": 1}, {"okey": 11, "ckey": 2},
                       {"okey": 12, "ckey": 9}])  # 9 has no match
    assert _rows(eng) == [(10, 1, "a"), (11, 2, "b")]
    # L_new ⋈ ΔR: a late right row joins EXISTING left rows
    eng.insert("cust", [{"cust_id": 9, "cname": "late"}])
    assert _rows(eng) == [(10, 1, "a"), (11, 2, "b"), (12, 9, "late")]
    # ΔL ⋈ R_new
    eng.insert("ord", [{"okey": 13, "ckey": 9}])
    assert (13, 9, "late") in _rows(eng)


def test_delete_cascades_from_either_side(spark, workspace):
    eng = Engine(spark, _cfg(), workspace=workspace)
    eng.insert("cust", [{"cust_id": 1, "cname": "a"}, {"cust_id": 2, "cname": "b"}])
    eng.insert("ord", [{"okey": 10, "ckey": 1}, {"okey": 11, "ckey": 1},
                       {"okey": 12, "ckey": 2}])
    assert len(_rows(eng)) == 3
    # left-side delete removes exactly that order's join row
    eng.delete("ord", "okey", 10)
    assert _rows(eng) == [(11, 1, "a"), (12, 2, "b")]
    # right-side delete removes every join row of that customer
    eng.delete("cust", "cust_id", 1)
    assert _rows(eng) == [(12, 2, "b")]


def test_join_result_matches_plain_join_on_bulk(spark, workspace):
    from pyspark.sql import functions as F

    eng = Engine(spark, _cfg(), workspace=workspace)
    cust = spark.range(50).select(
        F.col("id").cast("long").alias("cust_id"),
        F.concat(F.lit("c"), F.col("id")).alias("cname"))
    orders = spark.range(500).select(
        F.col("id").cast("long").alias("okey"),
        (F.col("id") % 80).cast("long").alias("ckey"))  # keys 50-79 dangle
    eng.insert_df("cust", cust)
    eng.insert_df("ord", orders)
    expected = sorted(
        (r["okey"], r["ckey"], r["cname"])
        for r in orders.join(cust, orders.ckey == cust.cust_id).collect()
    )
    assert _rows(eng) == expected


def test_restart_resumes_join_maintenance(spark, workspace):
    """A new Engine over the same workspace re-opens the derived join
    table from disk (same static-derivation path as test_restart.py) and
    keeps maintaining it: post-restart deltas join the PRE-restart
    committed state of the other parent, and deletes still cascade
    through both provenance columns."""
    eng1 = Engine(spark, _cfg(), workspace=workspace)
    eng1.insert("cust", [{"cust_id": 1, "cname": "a"}, {"cust_id": 2, "cname": "b"}])
    eng1.insert("ord", [{"okey": 10, "ckey": 1}])
    seq_before = eng1._seq

    eng2 = Engine(spark, _cfg(), workspace=workspace)  # reattach
    assert eng2._seq >= seq_before
    assert _rows(eng2) == [(10, 1, "a")]
    # ΔL ⋈ R_old where R_old was committed by the PREVIOUS engine
    eng2.insert("ord", [{"okey": 11, "ckey": 2}])
    assert _rows(eng2) == [(10, 1, "a"), (11, 2, "b")]
    # L_old ⋈ ΔR across the restart boundary too
    eng2.insert("cust", [{"cust_id": 9, "cname": "late"}])
    eng2.insert("ord", [{"okey": 12, "ckey": 9}])
    assert _rows(eng2) == [(10, 1, "a"), (11, 2, "b"), (12, 9, "late")]
    # provenance survived the restart: delete cascades from either side
    eng2.delete("ord", "okey", 10)
    eng2.delete("cust", "cust_id", 9)
    assert _rows(eng2) == [(11, 2, "b")]


def _diamond_cfg():
    """Shared-ancestry diamond: both join parents derive from ord, so ONE
    source commit delivers deltas to BOTH parents in the same wave."""
    return {"tables": [
        {"Source": {"name": "ord", "columns": {"okey": "Integer", "ckey": "Integer"}}},
        {"Derived": {"name": "l", "transform_definition": {
            "FunctionTransform": {"source_table": "ord",
                                  "functions": ["k1 ~ ckey", "a ~ okey"]}}}},
        {"Derived": {"name": "r", "transform_definition": {
            "FunctionTransform": {"source_table": "ord",
                                  "functions": ["k2 ~ ckey", "b ~ okey"]}}}},
        {"Derived": {"name": "j", "transform_definition": {
            "JoinTransform": {"left_table": "l", "right_table": "r",
                              "left_on": "k1", "right_on": "k2"}}}},
    ]}


def _jrows(eng):
    return sorted(
        (r["a"], r["b"], r["k1"])
        for r in eng.table("j").select("a", "b", "k1").collect()
    )


def test_diamond_wave_counts_delta_cross_once(spark, workspace):
    """The ΔL×ΔR exactness case the old build-time rejection guarded
    against: with both parents changed in ONE wave, every new pair must
    appear exactly once (Δ(L⋈R) = ΔL⋈R_new ∪ (L_new−ΔL)⋈ΔR)."""
    eng = Engine(spark, _diamond_cfg(), workspace=workspace)
    eng.insert("ord", [{"okey": 1, "ckey": 7}, {"okey": 2, "ckey": 7},
                       {"okey": 3, "ckey": 8}])
    # key 7: 2 l-rows × 2 r-rows; key 8: 1×1 — 5 pairs, no doubles
    assert _jrows(eng) == [(1, 1, 7), (1, 2, 7), (2, 1, 7), (2, 2, 7),
                           (3, 3, 8)]
    # second wave: the new row pairs with old rows on BOTH sides and
    # with itself, each exactly once (key 7 now 3×3, key 8 still 1×1)
    eng.insert("ord", [{"okey": 4, "ckey": 7}])
    rows = _jrows(eng)
    assert len(rows) == 10
    for pair in [(1, 4, 7), (4, 1, 7), (4, 4, 7)]:
        assert rows.count(pair) == 1


def test_diamond_delete_cascades_both_sides_one_wave(spark, workspace):
    """A source delete reaches the join through BOTH provenance columns
    in one wave: every pair touching the deleted row vanishes, the rest
    survive."""
    eng = Engine(spark, _diamond_cfg(), workspace=workspace)
    eng.insert("ord", [{"okey": 1, "ckey": 7}, {"okey": 2, "ckey": 7},
                       {"okey": 3, "ckey": 8}])
    eng.delete("ord", "okey", 2)
    assert _jrows(eng) == [(1, 1, 7), (3, 3, 8)]


def test_config_rejections(spark, workspace):
    # self-join
    bad = _cfg()
    bad["tables"][2]["Derived"]["transform_definition"]["JoinTransform"]["right_table"] = "ord"
    with pytest.raises(ConfigError, match="self-join"):
        Engine(spark, bad, workspace=workspace)
    # column collision
    coll = _cfg()
    coll["tables"][1]["Source"]["columns"] = {"cust_id": "Integer", "okey": "Str"}
    with pytest.raises(ConfigError, match="collision"):
        Engine(spark, coll, workspace=workspace)
