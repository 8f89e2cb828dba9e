"""Round-10 ADVICE regression tests: the DSIR per-doc bucket count
widened DECIMAL(6,0) -> DECIMAL(9,0) with a loud raise_error guard (Spark
non-ANSI would otherwise null an overflowed cast and silently skip the
term while the DuckDB oracle errors), and the guarded fuzzy-join oracle's
short-name fixture invariant (the shared _GUARDED_CAND_CTES drops names
with length <= 3 while edit_distance_join routes them through the
short-pool brute-force block — a fixture with short names must trip a
TARGETED failure here, not an opaque rows_match mismatch)."""

import glob
import os

import duckdb
import pytest
from pyspark.sql import functions as F


# -- dsir: widened count decimal + loud overflow guard -----------------

def test_dsir_term_uses_decimal_9_with_guard(spark):
    """The term product must be DECIMAL(9,0) x DECIMAL(28,14) =
    DECIMAL(38,14) — the widest exact form — and the plan must carry the
    raise_error guard instead of a bare (nullable-on-overflow) cast."""
    from reactivedb_spark.operators.importance import dsir_log_weights

    df = spark.createDataFrame(
        [(1, "a b a", "en"), (2, "b c", "fr")],
        "doc_id long, text string, lang string")
    out = dsir_log_weights(df, "doc_id", "text",
                           F.col("lang") == "en", n_buckets=16)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "decimal(9,0)" in plan
    assert "decimal(6,0)" not in plan
    assert "raise_error" in plan
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_tokens"] == 3 and rows[2]["n_tokens"] == 2


def test_dsir_oracle_sql_mirrors_decimal_width():
    from reactivedb_spark.operators.importance import dsir_oracle_sql

    sql = dsir_oracle_sql("documents", "doc_id", "text", "lang = 'en'")
    assert "DECIMAL(9,0)" in sql
    assert "DECIMAL(6,0)" not in sql


# -- fuzzy-join oracle: short-name fixture invariant -------------------

@pytest.mark.parametrize("sf_dir", sorted(glob.glob("/root/testdata/sf*")))
def test_no_short_customer_names_in_fixtures(sf_dir):
    """_GUARDED_CAND_CTES (suite/advanced.py) drops c_name with
    length <= 3; edit_distance_join brute-forces them in its short pool
    (q=2, d=1 -> short_max_len 3). The two agree ONLY while no fixture
    name is that short. Today every c_name is length 18; if a future
    fixture regeneration ever emits short names, fail HERE with a named
    invariant instead of a hash mismatch in the driver gate."""
    path = os.path.join(sf_dir, "customer.parquet")
    if not os.path.exists(path):
        pytest.skip("fixture tier lacks customer.parquet")
    (min_len,) = duckdb.sql(
        f"SELECT min(length(c_name)) FROM '{path}' "
        "WHERE c_name IS NOT NULL").fetchone()
    # boundary is length <= 3 (q=2, d=1 -> short_max_len 3): a length-4
    # name is handled identically by both paths (main prefix path and
    # oracle both keep it; the short pool stays empty)
    assert min_len is not None and min_len > 3, (
        f"{path}: min(length(c_name)) = {min_len} <= 3 — the guarded "
        "fuzzy-join oracle and edit_distance_join's short pool now "
        "diverge; extend _GUARDED_CAND_CTES with the short-pool block "
        "before regenerating fixtures with short names")


# -- promote_bench: default file set bounded by BENCH_FULL mtime -------

def test_promote_bench_default_excludes_stale_raw(tmp_path, monkeypatch):
    """With no explicit files, promotion must ignore raw runs OLDER than
    the committed BENCH_FULL.json (ADVICE r9: the gitignored evidence
    dir is never pruned, so stale pre-change runs would otherwise feed
    the medians forever)."""
    import importlib.util
    import json as _json

    spec = importlib.util.spec_from_file_location(
        "promote_bench", "/root/repo/scripts/promote_bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    repo = tmp_path
    ev = repo / ".bench_evidence"
    ev.mkdir()
    stale = ev / "BENCH_RAW_20200101-000000.json"
    fresh = ev / "BENCH_RAW_20990101-000000.json"
    rec = {"queries": {"q": 9.0}, "load1": {"q": 1.0}, "sf": 0.1}
    stale.write_text(_json.dumps(rec))
    full = repo / "BENCH_FULL.json"
    full.write_text(_json.dumps({"queries": {"q": 1.0}, "sf": 0.1}))
    rec2 = {"queries": {"q": 2.0}, "load1": {"q": 1.0}, "sf": 0.1}
    fresh.write_text(_json.dumps(rec2))
    os.utime(stale, (1, 1))
    os.utime(full, (100, 100))
    os.utime(fresh, (200, 200))

    monkeypatch.setattr(mod, "HERE", str(repo))
    monkeypatch.setattr("sys.argv", ["promote_bench.py"])
    mod.main()
    out = _json.loads(full.read_text())
    # the stale 9.0 sample must not contribute: median of {2.0} only
    assert out["queries"]["q"] == 2.0
    assert out["promotion"]["raw_files_used"] == [fresh.name]
