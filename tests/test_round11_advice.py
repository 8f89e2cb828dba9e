"""Round-11 ADVICE regression tests (all four r10 findings):

1. importance.py — the Gumbel selection term −ln(−ln(u)) is pinned by
   round(·,6) BY ITSELF before the add with the pre-pinned log_w, and
   u is clamped ≥ 2⁻⁶⁰ so an h==0 row yields a finite key instead of
   Spark-NULL / DuckDB-error.
2. engine.py — flush_listeners() called from a synchronous listener
   callback raises loudly instead of deadlocking against a committing
   asynchronous callback.
3. promote_bench.py — when the prior committed record pins an sf, a raw
   with NO sf field is gated out (it previously bypassed the cross-sf
   contamination guard).
4. bench.py — --quick's median_ratio is the interpolating
   statistics.median, consistent with promote_bench.
"""

import json
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from reactivedb_spark import Engine


# -- 1. dsir_resample: separately-pinned Gumbel + u clamp ---------------

def test_gumbel_term_separately_pinned_in_plan(spark):
    """The analyzed plan must round the Gumbel draw before the add (two
    round calls on the key path) and clamp u via greatest — the pin
    shrinks the unpinned libm surface to the draw alone."""
    from reactivedb_spark.operators.importance import dsir_resample

    df = spark.createDataFrame(
        [(1, "a b", "en"), (2, "b c", "fr"), (3, "a c", "en")],
        "doc_id long, text string, lang string")
    out = dsir_resample(df, "doc_id", "text",
                        F.col("lang") == "en", budget=2, n_buckets=16)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert plan.count("round") >= 2
    assert "greatest" in plan
    rows = out.collect()
    assert len(rows) == 2
    assert all(r["sel_key"] is not None and math.isfinite(r["sel_key"])
               for r in rows)


def test_gumbel_u_zero_clamp_matches_duckdb():
    """u == 2⁻⁶⁰ (the clamp floor, i.e. the h==0 pathological row) must
    produce the identical finite sel_key contribution in DuckDB — the
    engine pair the oracle gate compares."""
    floor = 2.0 ** -60
    expected = round(-math.log(-math.log(floor)), 6)
    got = duckdb.sql(
        "SELECT round(-ln(-ln(greatest(0.0, 8.673617379884035e-19))), 6)"
    ).fetchone()[0]
    assert got == expected and math.isfinite(got)


def test_resample_oracle_sql_mirrors_inner_round_and_clamp():
    from reactivedb_spark.operators.importance import dsir_resample_oracle_sql

    sql = dsir_resample_oracle_sql("documents", "doc_id", "text",
                                   "lang = 'en'", budget=10)
    # inner pin present: round(log_w + round(-ln(-ln(greatest(...))),6),6)
    assert "round(log_w + round(-ln(-ln(greatest(" in sql
    assert "8.673617379884035e-19" in sql


# -- 2. flush_listeners from a sync listener raises ---------------------

_CFG = {"tables": [{"Source": {"name": "t",
                               "columns": {"k": "Integer", "v": "Integer"}}}]}


def test_flush_listeners_inside_sync_callback_raises(spark, tmp_path):
    eng = Engine(spark, _CFG, workspace=str(tmp_path / "ws"))
    seen = []

    def sync_cb(df):
        with pytest.raises(RuntimeError, match="flush_listeners"):
            eng.flush_listeners()
        seen.append(df.count())

    eng.listen("t", "Insert", sync_cb)
    eng.insert("t", [{"k": 1, "v": 2}])
    assert seen == [1]
    # outside delivery the barrier still works
    eng.flush_listeners()


# -- 3. promote_bench gates out sf-less raws ----------------------------

def test_promote_gates_out_raw_missing_sf(tmp_path, monkeypatch):
    """Prior record pins sf=0.1; a legacy raw with NO sf field must be
    gated out, not merged (it previously slipped past the cross-sf
    guard because rec_sf is None skipped the comparison)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "promote_bench", "/root/repo/scripts/promote_bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    ev = tmp_path / ".bench_evidence"
    ev.mkdir()
    full = tmp_path / "BENCH_FULL.json"
    full.write_text(json.dumps({"queries": {"q1": 1.0}, "sf": 0.1}))
    good = {"sf": 0.1, "queries": {"q1": 1.2}, "load1": {"q1": 0.1}}
    legacy = {"queries": {"q1": 99.0}, "load1": {"q1": 0.1}}
    (ev / "BENCH_RAW_20260815-000001.json").write_text(json.dumps(good))
    (ev / "BENCH_RAW_20260815-000002.json").write_text(json.dumps(legacy))

    monkeypatch.setattr(mod, "HERE", str(tmp_path))
    monkeypatch.setattr("sys.argv", ["promote_bench.py", "--all"])
    mod.main()
    out = json.loads(full.read_text())
    # the legacy 99.0 sample must not contribute
    assert out["queries"]["q1"] == 1.2
    assert any("000002" in g
               for g in out["promotion"]["raw_files_gated_out"])


# -- 4. bench --quick median is interpolating ---------------------------

def test_bench_quick_median_is_interpolating():
    import ast
    import inspect
    import statistics

    import bench

    src = inspect.getsource(bench)
    assert "statistics.median(ratios.values())" in src
    # even-count check of the stat itself
    assert statistics.median([1.0, 2.0, 3.0, 4.0]) == 2.5
    ast.parse(src)
