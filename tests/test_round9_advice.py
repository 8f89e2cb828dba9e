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


# -- listen: an empty cascade level fires NO event ---------------------

def test_listener_empty_level_fires_no_event(spark):
    """The oracle for listen_cascade_events encodes conditional
    n_events; pin the engine side: a cascade level whose delta is
    empty delivers nothing (no zero-row callback)."""
    cfg = {"tables": [
        {"Source": {"name": "customer", "columns": {
            "c_custkey": "Integer", "c_acctbal": "Float"}}},
        {"Derived": {"name": "impossible",
                     "transform_definition": {"FilterTransform": {
                         "source_table": "customer",
                         "filter": "c_acctbal > 99999999.0"}}}},
    ]}
    eng = Engine(spark, cfg, workspace=tempfile.mkdtemp(prefix="rdb_r9b_"))
    fired = []
    eng.listen("impossible", "Insert", lambda df: fired.append(df.count()))
    eng.listen("impossible", "Delete", lambda df: fired.append(df.count()))
    eng.insert("customer", [{"c_custkey": 1, "c_acctbal": 10.0}])
    eng.delete("customer", "c_custkey", 1)
    assert fired == []  # level never populated -> no events either way


# -- length_buckets: NULL text is a 0-token doc in both engines --------

def test_length_buckets_null_text_counts_zero(spark):
    from reactivedb_spark.operators.packing import length_buckets

    df = spark.createDataFrame(
        [(1, "s", None), (2, "s", "w w"), (3, "s", "w w w w")],
        "doc_id long, src string, text string")
    got = {r.bucket: r for r in
           length_buckets(df, "doc_id", "src", "text", k=2).collect()}
    # NULL doc sorts as 0 tokens into bucket 1 (with doc 2); bucket 1
    # totals 2 tokens with max 2 -> waste (2*2-2)/(2*2)
    assert (got[1].n_docs, got[1].total_tokens, got[1].max_tokens) == (2, 2, 2)
    assert got[1].waste_ppm == 500_000
    assert (got[2].n_docs, got[2].max_tokens) == (1, 4)


# -- distinct_transform: rebirth elects the new streak's first arrival -

def test_distinct_rebirth_elects_new_streak_representative(spark):
    cfg = {"tables": [
        {"Source": {"name": "ev", "columns": {
            "eid": "Integer", "user": "Str"}}},
        {"Derived": {"name": "users",
                     "transform_definition": {"DistinctTransform": {
                         "source_table": "ev", "columns": ["user"]}}}},
    ]}
    eng = Engine(spark, cfg, workspace=tempfile.mkdtemp(prefix="rdb_r9c_"))
    eng.insert("ev", [{"eid": 1, "user": "u"}])
    first = eng.table("users").collect()
    eng.delete("ev", "eid", 1)           # refcount 0 -> row dies
    assert eng.table("users").count() == 0
    eng.insert("ev", [{"eid": 2, "user": "u"}])
    reborn = eng.table("users").collect()
    # the representative is the NEW streak's first arrival — provenance
    # never reaches back across a death (docstring consequence (b))
    assert len(first) == 1 and len(reborn) == 1
    assert reborn[0]["user"] == "u"
