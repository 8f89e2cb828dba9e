"""Engine restart: a new Engine over an existing workspace resumes state
and the global sequence (reference: tables re-open from disk on start,
storage_manager_table.rs:262-293)."""

from reactivedb_spark import Engine

CFG = {
    "tables": [
        {"Source": {"name": "users", "columns": {"name": "Str", "age": "Integer"}}},
        {"Source": {"name": "grades", "columns": {"name": "Str", "grade": "Integer"}}},
        {"Derived": {"name": "unionTest",
                     "transform_definition": {"UnionTransform": {
                         "tables_and_foreign_keys": [["users", "name"], ["grades", "name"]]}}}},
    ]
}


def test_restart_resumes_state_and_sequence(spark, workspace):
    eng1 = Engine(spark, CFG, workspace=workspace)
    eng1.insert("users", [{"name": "A", "age": 1}])
    eng1.insert("grades", [{"name": "A", "grade": 50}])
    seq_before = eng1._seq

    eng2 = Engine(spark, CFG, workspace=workspace)  # reattach
    assert eng2._seq >= seq_before  # sequence resumes, never rewinds
    assert eng2.table("users").count() == 1
    r = eng2.find_one("unionTest", "matchingKey", "A")
    assert r["age"] == 1 and r["grade"] == 50

    # post-restart writes are strictly newer: LWW must prefer them
    eng2.insert("users", [{"name": "A", "age": 2}])
    r2 = eng2.find_one("unionTest", "matchingKey", "A")
    assert r2["age"] == 2 and r2["grade"] == 50


RICH_CFG = {
    "tables": [
        {"Source": {"name": "items", "columns": {
            "sku": "Str", "qty": "Integer", "price": "Decimal",
            "active": "Bool", "tags": {"Array": "Integer"},
            "meta": {"Map": {"points": "Integer", "label": "Str"}}}}},
        {"Source": {"name": "stock", "columns": {
            "sku": "Str", "on_hand": "Integer"}}},
        {"Derived": {"name": "priced",
                     "transform_definition": {"FunctionTransform": {
                         "source_table": "items",
                         "functions": ["total ~ price * qty",
                                       "unit ~ price / (qty + 1)"]}}}},
        {"Derived": {"name": "bulk",
                     "transform_definition": {"FilterTransform": {
                         "source_table": "items", "filter": "qty > 5"}}}},
        {"Derived": {"name": "bySku",
                     "transform_definition": {"AggregationTransform": {
                         "source_table": "items", "aggregated_column": "sku",
                         "functions": ["n ~ memo.n + 1",
                                       "spend ~ memo.spend + (price * qty)",
                                       "avg ~ memo.spend / memo.n"]}}}},
        {"Derived": {"name": "joined",
                     "transform_definition": {"UnionTransform": {
                         "tables_and_foreign_keys": [["items", "sku"],
                                                     ["stock", "sku"]]}}}},
    ]
}

_HOSTILE_SESSIONS = [
    # (ansi, timezone, shuffle partitions) — the driver's hostile axes
    ("true", "America/New_York", "7"),
    ("false", "Asia/Kolkata", "3"),
]


def test_restart_matrix_schema_and_contents_stable(spark, workspace):
    """VERDICT r11 #8: the reference re-infers derived schemas on restart
    (storage_manager_table.rs:262-293); ours derives statically from
    config. Commit through every transform kind + every typed column,
    then reattach a fresh engine to the workspace under DIFFERENT
    hostile session settings (ANSI flip, timezone change, shuffle
    partitions) and assert every table — source and derived — has a
    byte-stable schema AND byte-stable contents (Decimals exact)."""
    from decimal import Decimal

    eng1 = Engine(spark, RICH_CFG, workspace=workspace)
    eng1.insert("items", [
        {"sku": "a", "qty": 3, "price": Decimal("1.25"), "active": True,
         "tags": [1, 2], "meta": {"points": 7, "label": "x"}},
        {"sku": "b", "qty": 9, "price": Decimal("-0.75"), "active": False,
         "tags": [], "meta": {"points": 0, "label": ""}},
        {"sku": "a", "qty": 6, "price": Decimal("2.5"), "active": True,
         "tags": [3], "meta": {"points": 1, "label": "y"}},
    ])
    eng1.insert("stock", [{"sku": "a", "on_hand": 11},
                          {"sku": "b", "on_hand": 0}])

    tables = [t for cfg in RICH_CFG["tables"] for t in
              [next(iter(cfg.values()))["name"]]]

    def snapshot(eng):
        out = {}
        for t in tables:
            df = eng.table(t)
            rows = sorted(
                (tuple(sorted(r.asDict(recursive=True).items()))
                 for r in df.collect()),
                key=repr,
            )
            out[t] = (df.schema, rows)
        return out

    before = snapshot(eng1)
    assert before["bySku"][1], "aggregation produced no rows"

    conf = spark.conf
    saved = {k: conf.get(k) for k in
             ("spark.sql.ansi.enabled", "spark.sql.session.timeZone",
              "spark.sql.shuffle.partitions")}
    try:
        for ansi, tz, shuffle in _HOSTILE_SESSIONS:
            conf.set("spark.sql.ansi.enabled", ansi)
            conf.set("spark.sql.session.timeZone", tz)
            conf.set("spark.sql.shuffle.partitions", shuffle)
            eng2 = Engine(spark, RICH_CFG, workspace=workspace)  # reattach
            after = snapshot(eng2)
            for t in tables:
                assert after[t][0] == before[t][0], (
                    f"schema drift on {t} under ansi={ansi} tz={tz}")
                assert after[t][1] == before[t][1], (
                    f"content drift on {t} under ansi={ansi} tz={tz}")
            # the reattached engine stays writable under the hostile
            # session and derived cascades still compute
            eng2.insert("items", [{"sku": f"c{ansi}", "qty": 7,
                                   "price": Decimal("3"), "active": True,
                                   "tags": [9],
                                   "meta": {"points": 2, "label": "z"}}])
            row = eng2.find_one("bySku", "aggregatedColumn", f"c{ansi}")
            assert row["n"] == 1
            eng2.delete("items", "sku", f"c{ansi}")
            assert snapshot(eng2)["items"][1] == before["items"][1]
    finally:
        for k, v in saved.items():
            if v is not None:
                conf.set(k, v)
