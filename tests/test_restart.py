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
