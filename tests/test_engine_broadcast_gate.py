"""Engine merge-path broadcast gate (VERDICT r4 "What's wrong" #1): the
keyed merge joins (union LWW, aggregation affected-keys, provenance
deletes, dedup re-derive) hint broadcast only while the staged delta's
parquet files fit ``engine._DELTA_BROADCAST_LIMIT``. Above the gate the
join is left unhinted — a bulk ``insert_df`` of a fact table must not
ship its key set through the driver."""

import pytest
from pyspark.sql import functions as F

from reactivedb_spark import engine as engine_mod
from reactivedb_spark.engine import Engine

CFG = {
    "tables": [
        {"Source": {"name": "orders", "columns": {
            "o_orderkey": "Integer", "o_custkey": "Integer",
            "o_totalprice": "Float"}}},
        {"Derived": {"name": "cust_totals",
                     "transform_definition": {"AggregationTransform": {
                         "source_table": "orders",
                         "aggregated_column": "o_custkey",
                         "functions": ["n ~ memo.n + 1",
                                       "total ~ memo.total + o_totalprice"]}}}},
    ]
}


def _totals(eng):
    return {
        r["aggregatedColumn"]: (r["n"], round(r["total"], 2))
        for r in eng.table("cust_totals").collect()
    }


def test_keyset_gate_unhinted_above_limit(spark, workspace, sf_dir, monkeypatch):
    """With the gate forced to 0 bytes every merge join takes the
    non-broadcast path; results must match the broadcast-path engine
    bit-for-bit (same inserts, two engines, two gates)."""
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.col("o_orderkey").cast("long"),
            F.col("o_custkey").cast("long"),
            F.col("o_totalprice"),
        )
        .limit(500)
    )
    first = orders.filter(F.col("o_orderkey") % 2 == 0)
    second = orders.filter(F.col("o_orderkey") % 2 == 1)

    eng_b = Engine(spark, CFG, workspace=workspace + "_b")
    eng_b.insert_df("orders", first)
    eng_b.insert_df("orders", second)
    want = _totals(eng_b)

    monkeypatch.setattr(engine_mod, "_DELTA_BROADCAST_LIMIT", 0)
    eng_s = Engine(spark, CFG, workspace=workspace + "_s")
    eng_s.insert_df("orders", first)
    eng_s.insert_df("orders", second)
    assert _totals(eng_s) == want and len(want) > 0


def test_keyset_helper_gates_on_staged_file_size(spark, workspace):
    """_keyset() hints a small file-backed delta and leaves a too-big one
    unhinted (limit forced to 1 byte)."""
    eng = Engine(spark, CFG, workspace=workspace)
    eng.insert("orders", [{"o_orderkey": 1, "o_custkey": 7, "o_totalprice": 2.5}])
    delta = eng.store.read("orders").select("o_custkey").distinct()
    assert engine_mod._keyset(delta)._jdf is not delta._jdf  # hinted
    try:
        old = engine_mod._DELTA_BROADCAST_LIMIT
        engine_mod._DELTA_BROADCAST_LIMIT = 1
        assert engine_mod._keyset(delta)._jdf is delta._jdf  # unhinted
    finally:
        engine_mod._DELTA_BROADCAST_LIMIT = old


def test_no_unconditional_broadcast_in_engine_source():
    """The VERDICT done-criterion, enforced: zero ``F.broadcast(`` sites
    in engine.py — every broadcast hint must route through _keyset."""
    import inspect

    src = inspect.getsource(engine_mod)
    assert "F.broadcast(" not in src
