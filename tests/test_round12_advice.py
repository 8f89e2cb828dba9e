"""Round-12 fixes, each pinned by a test (ADVICE r11 + VERDICT r11):

1. compiler — array comparisons require COMPARABLE element types at
   compile time (ADVICE r11 #1): Array(Integer) vs Array(Str) was a
   runtime Spark AnalysisException before, contradicting the typed
   compile-error contract for mixed-kind comparisons.
2. promote_bench — a raw whose own canary block shows contention
   (max_over_p25 / max_sec over the committed calm band) is gated out
   of the committed medians even when its ambient load1 floor passed
   (VERDICT r11 #7).
3. promote_bench prune — sessions cited in raw_files_gated_out and in
   BASELINE.md prose survive pruning (ADVICE r11 #2); previously only
   raw_files_used + the 8 newest survived, so arbitration evidence was
   irreversibly deleted.
4. bench payload layout — the stdout line carries `queries` as the
   LAST key and only a compact load1 summary, so the driver's tail
   capture retains per-query walls (VERDICT r11 #2; BENCH_r11 lost all
   of them behind the full load1 dict).
5. DSL fuzz oracle — fl18/ce18 carry the long-overflow NULL leg
   (lguard) mirroring the compiler's try_cast('long') (ADVICE r11 #4).
"""

import json

import pytest
from pyspark.sql import types as T

from reactivedb_spark.errors import ExpressionError
from reactivedb_spark.expr.compiler import compile_expr
from reactivedb_spark.expr.parser import parse_expression


def _load_promote():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "promote_bench", "/root/repo/scripts/promote_bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# -- 1. array comparisons need comparable element types ------------------

SCHEMA = T.StructType([
    T.StructField("ai", T.ArrayType(T.LongType())),
    T.StructField("aj", T.ArrayType(T.IntegerType())),
    T.StructField("as_", T.ArrayType(T.StringType())),
    T.StructField("aai", T.ArrayType(T.ArrayType(T.LongType()))),
    T.StructField("aas", T.ArrayType(T.ArrayType(T.StringType()))),
])


@pytest.mark.usefixtures("spark")
def test_array_mismatched_elements_is_compile_error():
    with pytest.raises(ExpressionError, match="element types differ"):
        compile_expr(parse_expression("ai == as_"), SCHEMA)
    # nested arrays recurse
    with pytest.raises(ExpressionError, match="element types differ"):
        compile_expr(parse_expression("aai == aas"), SCHEMA)


@pytest.mark.usefixtures("spark")
def test_array_promotable_and_equal_elements_still_compile():
    # numeric elements of different widths are promotable, same as scalars
    out = compile_expr(parse_expression("ai == aj"), SCHEMA)
    assert isinstance(out.dtype, T.BooleanType)
    out = compile_expr(parse_expression("as_ != as_"), SCHEMA)
    assert isinstance(out.dtype, T.BooleanType)
    out = compile_expr(parse_expression("aai == aai"), SCHEMA)
    assert isinstance(out.dtype, T.BooleanType)


# -- 2. contended-canary raws are gated out of promotion ------------------

def test_promote_gates_out_contended_canary_raw(tmp_path, monkeypatch):
    mod = _load_promote()
    ev = tmp_path / ".bench_evidence"
    ev.mkdir()
    full = tmp_path / "BENCH_FULL.json"
    full.write_text(json.dumps({"queries": {"q1": 1.0}, "sf": 0.1}))
    calm = {"sf": 0.1, "queries": {"q1": 1.2}, "load1": {"q1": 0.1},
            "canary": {"n": 9, "p25_sec": 0.16, "max_sec": 0.36,
                       "max_over_p25": 2.2}}
    # ambient floor passes the load gate, but the session's own canary
    # shows a mid-suite contention window — must be gated out
    contended = {"sf": 0.1, "queries": {"q1": 44.0}, "load1": {"q1": 0.1},
                 "canary": {"n": 9, "p25_sec": 0.2, "max_sec": 2.4,
                            "max_over_p25": 12.0}}
    (ev / "BENCH_RAW_20260816-000001.json").write_text(json.dumps(calm))
    (ev / "BENCH_RAW_20260816-000002.json").write_text(json.dumps(contended))

    monkeypatch.setattr(mod, "HERE", str(tmp_path))
    monkeypatch.setattr("sys.argv", ["promote_bench.py", "--all"])
    mod.main()
    out = json.loads(full.read_text())
    assert out["queries"]["q1"] == 1.2  # 44.0 never contributed
    gated = out["promotion"]["raw_files_gated_out"]
    assert any("000002" in g and "canary" in g for g in gated)
    assert any("000001" in u
               for u in out["promotion"]["raw_files_used"])


def test_promote_accepts_pre_canary_raws(tmp_path, monkeypatch):
    """Raws without a canary block (pre-r11) still qualify via the
    load1 floor alone — the canary gate never rejects absent evidence."""
    mod = _load_promote()
    ev = tmp_path / ".bench_evidence"
    ev.mkdir()
    full = tmp_path / "BENCH_FULL.json"
    full.write_text(json.dumps({"queries": {}, "sf": 0.1}))
    legacy = {"sf": 0.1, "queries": {"q1": 2.0}, "load1": {"q1": 0.2}}
    (ev / "BENCH_RAW_20260816-000003.json").write_text(json.dumps(legacy))
    monkeypatch.setattr(mod, "HERE", str(tmp_path))
    monkeypatch.setattr("sys.argv", ["promote_bench.py", "--all"])
    mod.main()
    out = json.loads(full.read_text())
    assert out["queries"]["q1"] == 2.0


# -- 3. prune keeps gated-out and BASELINE-cited sessions -----------------

def test_prune_keeps_gated_out_and_baseline_cited(tmp_path):
    mod = _load_promote()
    ev = tmp_path / ".bench_evidence"
    ev.mkdir()
    full = tmp_path / "BENCH_FULL.json"
    full.write_text(json.dumps({
        "queries": {}, "sf": 0.1,
        "promotion": {
            "raw_files_used": ["BENCH_RAW_20260801-000001.json"],
            "raw_files_gated_out": [
                "BENCH_RAW_20260801-000002.json (canary max_over_p25=12)"],
        }}))
    (tmp_path / "BASELINE.md").write_text(
        "Adjudicated from sidecar BENCH_CANARY_20260801-000003.jsonl.\n")
    stamps = [f"20260801-00000{i}" for i in range(1, 10)]
    for s in stamps:
        (ev / f"BENCH_RAW_{s}.json").write_text("{}")
    summary = mod.prune_evidence(str(ev), str(full), keep_last=2)
    surviving = {e for e in ev.iterdir()}
    names = {p.name for p in surviving}
    # used, gated-out, and BASELINE-cited all survive even though only
    # the 2 newest are retained by recency
    assert "BENCH_RAW_20260801-000001.json" in names
    assert "BENCH_RAW_20260801-000002.json" in names  # gated-out evidence
    assert "BENCH_RAW_20260801-000003.json" in names  # BASELINE citation
    assert "BENCH_RAW_20260801-000008.json" in names  # recency
    assert "BENCH_RAW_20260801-000009.json" in names  # recency
    assert "BENCH_RAW_20260801-000004.json" not in names
    assert len(summary["deleted"]) == 4  # 000004..000007


# -- 4. bench stdout payload: queries last, load1 compact -----------------

def test_bench_payload_queries_is_last_key():
    import ast
    import inspect

    import bench

    src = inspect.getsource(bench.main)
    # the full per-query load1 dict goes in the RAW file payload only
    assert 'raw_payload["load1"]' in src
    # queries is assigned onto the stdout payload immediately before the
    # print — the LAST key on the line, so the driver's tail capture
    # keeps per-query walls (VERDICT r11 #2)
    tail = src[src.rindex('payload["queries"]'):]
    assert "print(json.dumps(payload))" in tail
    # nothing assigns another payload key after queries
    after = tail[tail.index("\n"):]
    assert 'payload[' not in after
    ast.parse(inspect.getsource(bench))


def test_bench_payload_has_no_full_load1_on_stdout():
    import inspect

    import bench

    src = inspect.getsource(bench.main)
    stdout_part = src[:src.index("raw_payload")]
    assert '"load1_summary"' in stdout_part
    assert 'payload["load1"]' not in stdout_part


# -- 5. fuzz oracle long-overflow leg -------------------------------------

def test_fl18_ce18_overflow_guard():
    duckdb = pytest.importorskip("duckdb")
    from tests.test_dsl_duckdb_fuzz import _MACROS, P18

    con = duckdb.connect()
    con.execute(_MACROS)
    big = (2 ** 63) * P18  # floor(big / P18) == 2^63 — just past long
    assert con.execute(
        f"SELECT fl18(CAST('{big}' AS HUGEINT))").fetchone()[0] is None
    # -2^63 itself is a valid long; one past it is not
    toobig_neg = (2 ** 63 + 1) * P18
    assert con.execute(
        f"SELECT ce18(CAST('-{toobig_neg}' AS HUGEINT))").fetchone()[0] is None
    assert con.execute(
        f"SELECT ce18(CAST('-{(2 ** 63) * P18}' AS HUGEINT))"
    ).fetchone()[0] == -(2 ** 63)
    # in-range values are untouched
    assert con.execute(
        f"SELECT fl18(CAST({P18} AS HUGEINT) * 7)").fetchone()[0] == 7
