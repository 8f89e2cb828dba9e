"""Round-9 ADVICE regression tests: assoc lift_ppm int64 wrap at scale
(widened to DECIMAL(38,0)), listener deltas hiding the internal
_refCount column, and fk orphan counting NULL child keys (plain
equality, not eqNullSafe)."""

import tempfile

from pyspark.sql import functions as F

from reactivedb_spark.engine import Engine


# -- assoc: lift product widened past int64 ----------------------------

def test_assoc_lift_survives_int64_product(spark):
    """n_pair * n_baskets * 1e6 > 2^63: 3.2M baskets all holding the
    same hot pair. Pre-fix the int64 product wrapped silently (Spark
    non-ANSI) while DuckDB errored; post-fix both engines agree on the
    exact DECIMAL(38,0) integral division."""
    from reactivedb_spark.operators.assoc import association_rules

    n = 3_200_000
    b = spark.range(n).select(F.col("id").alias("bk"))
    bi = b.select("bk", F.lit(7).alias("item")).unionByName(
        b.select("bk", F.lit(9).alias("item")))
    out = association_rules(bi, "bk", "item", min_count=3).collect()
    assert len(out) == 2  # both directions of the one pair
    for r in out:
        assert r["n_pair"] == n
        assert r["support_ppm"] == 1_000_000
        assert r["confidence_ppm"] == 1_000_000
        # exact: (n * n * 1e6) // (n * n) — a wrapped int64 product
        # would land far from 1e6 (and negative for this n)
        assert r["lift_ppm"] == 1_000_000


def test_assoc_lift_plan_is_decimal_widened(spark):
    from reactivedb_spark.operators.assoc import association_rules

    bi = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2)], ["bk", "item"])
    out = association_rules(bi, "bk", "item", min_count=3)
    plan = out._jdf.queryExecution().analyzed().toString().lower()
    assert "decimal(38,0)" in plan


# -- listener deltas: _refCount is internal state ----------------------

def test_listener_delta_hides_refcount(spark):
    cfg = {"tables": [
        {"Source": {"name": "ev", "columns": {
            "eid": "Integer", "user": "Str", "kind": "Str"}}},
        {"Derived": {"name": "pairs",
                     "transform_definition": {"DistinctTransform": {
                         "source_table": "ev",
                         "columns": ["user", "kind"]}}}},
    ]}
    eng = Engine(spark, cfg, workspace=tempfile.mkdtemp(prefix="rdb_r9a_"))
    seen: list[list[str]] = []
    eng.listen("pairs", "Insert", lambda df: seen.append(df.columns))
    eng.insert("ev", [{"eid": 1, "user": "u1", "kind": "click"}])
    assert seen, "insert on the source must fire the derived listener"
    for cols in seen:
        assert "_refCount" not in cols  # constants.py: pure internal state
        assert "_seq" not in cols and "_kb" not in cols


# -- fk orphans: NULL child keys are orphans ---------------------------

def test_fk_null_child_key_is_orphan_even_vs_null_parent(spark):
    from reactivedb_spark.operators.quality import audit

    child = spark.createDataFrame(
        [(1, 10.0), (None, 20.0), (3, 30.0)], "k int, v double")
    parent = spark.createDataFrame([(1,), (None,)], "pk int")
    got = {r.metric: r.value for r in audit(
        child, checks={}, fk=(parent, ["k"], ["pk"])).collect()}
    # k=None must NOT match the NULL parent key (plain =, per the
    # module contract and the SQL oracle); k=3 has no parent
    assert got["fk_orphan_rows"] == 2
