"""Subprocess body for the crash-injection atomicity test (VERDICT r11
#4). Not a test module — spawned by tests/test_transactions.py.

Commits a baseline through a 3-table DAG (source append path + derived
keyed-upsert version-flip path), then starts a second insert and
``os._exit``s at the exact point between the commit's staged/appended
bucket writes and the durable version-pointer flip (``save_meta``'s
atomic meta.json replace). Everything the second commit wrote is on
disk; nothing is referenced by the committed meta — the parent asserts
a fresh engine over the workspace reads the baseline for EVERY table
and reaps the orphan staging."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from reactivedb_spark import Engine
from reactivedb_spark.store import ParquetSnapshotStore

CFG = {
    "tables": [
        {"Source": {"name": "users",
                    "columns": {"uid": "Integer", "score": "Integer"}}},
        {"Derived": {"name": "big",
                     "transform_definition": {"FilterTransform": {
                         "source_table": "users", "filter": "score > 10"}}}},
        {"Derived": {"name": "totals",
                     "transform_definition": {"AggregationTransform": {
                         "source_table": "users",
                         "aggregated_column": "uid",
                         "functions": ["n ~ memo.n + 1"]}}}},
    ]
}


def main() -> None:
    ws = sys.argv[1]
    spark = (SparkSession.builder.master("local[2]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .appName("crash_child").getOrCreate())
    eng = Engine(spark, CFG, workspace=ws)
    eng.insert("users", [{"uid": 1, "score": 5}, {"uid": 2, "score": 50}])

    # Kill the process at the instant end_commit reaches the durable
    # pointer flip: every bucket/delta write of commit 2 has hit disk,
    # the in-memory pointers have flipped, but meta.json still describes
    # commit 1. (The reference survives this by process isolation +
    # journal replay, database.rs:317-396; our analogue is the manifest
    # reap in ParquetSnapshotStore._recover.)
    def die(self):  # noqa: ARG001 - bound method signature
        os._exit(42)

    ParquetSnapshotStore.save_meta = die
    eng.insert("users", [{"uid": 3, "score": 99}, {"uid": 1, "score": 7}])
    os._exit(1)  # unreachable: save_meta fires inside end_commit


if __name__ == "__main__":
    main()
