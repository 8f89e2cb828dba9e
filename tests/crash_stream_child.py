"""Subprocess body for the crash × streaming × listen test (VERDICT r12
#5). Not a test module — spawned by tests/test_transactions.py.

Runs an engine with SUBSCRIBERS (sync listeners appending every Insert
event row to ``<ws>/listen_log.jsonl``) fed by a Structured Streaming
file source through ``stream_into`` (checkpointed foreachBatch). Batch 1
commits normally; batch 2 is killed at one of two exactly-once-critical
instants:

  mode A (exit 42) — between the commit's bucket writes and the durable
      meta.json pointer flip (``save_meta``): the engine commit is NOT
      durable and the stream checkpoint has NO marker for the epoch.
  mode B (exit 43) — after the engine commit (epoch noted atomically in
      meta.json) but BEFORE foreachBatch returns: the engine commit IS
      durable, the stream checkpoint has NO marker — the classic
      double-apply window the epoch ledger exists for.

The parent asserts, per mode: pre-crash snapshot on reattach, zero
phantom/duplicate listener events, and an exactly-once resume from the
same checkpoint (mode A replays the batch once; mode B skips the replay
via the ledger)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, types as T

from reactivedb_spark import Engine
from reactivedb_spark.store import ParquetSnapshotStore
from reactivedb_spark.streaming.listen import stream_into

CFG = {
    "tables": [
        {"Source": {"name": "users",
                    "columns": {"uid": "Integer", "score": "Integer"}}},
        {"Derived": {"name": "big",
                     "transform_definition": {"FilterTransform": {
                         "source_table": "users", "filter": "score > 10"}}}},
    ]
}

STREAM_SCHEMA = T.StructType([
    T.StructField("uid", T.LongType()),
    T.StructField("score", T.LongType()),
])

BATCH1 = [{"uid": 1, "score": 5}, {"uid": 2, "score": 50}]
BATCH2 = [{"uid": 3, "score": 99}, {"uid": 4, "score": 7}]


def attach_logger(eng: Engine, ws: str, log_name: str) -> None:
    path = os.path.join(ws, log_name)

    def log(table):
        def cb(df):
            with open(path, "a") as f:
                for r in df.collect():
                    d = r.asDict()
                    f.write(json.dumps({"table": table, "uid": d["uid"],
                                        "score": d["score"]}) + "\n")
        return cb

    eng.listen("users", "Insert", log("users"))
    eng.listen("big", "Insert", log("big"))


def run_available_now(eng: Engine, spark, src_dir: str, ckpt: str) -> None:
    stream = spark.readStream.schema(STREAM_SCHEMA).json(src_dir)
    q = stream_into(eng, "users", stream, checkpoint_dir=ckpt,
                    trigger_once=True)
    q.awaitTermination(300)
    q.stop()


def main() -> None:
    ws, mode = sys.argv[1], sys.argv[2]
    src_dir = os.path.join(ws, "stream_src")
    ckpt = os.path.join(ws, "ckpt")
    os.makedirs(src_dir, exist_ok=True)
    spark = (SparkSession.builder.master("local[2]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .appName("crash_stream_child").getOrCreate())
    eng = Engine(spark, CFG, workspace=ws)
    attach_logger(eng, ws, "listen_log.jsonl")

    with open(os.path.join(src_dir, "f1.json"), "w") as f:
        for row in BATCH1:
            f.write(json.dumps(row) + "\n")
    run_available_now(eng, spark, src_dir, ckpt)  # batch 1: clean commit

    # arm the kill, then feed batch 2
    if mode == "A":
        def die(self):  # noqa: ARG001
            os._exit(42)
        ParquetSnapshotStore.save_meta = die
    else:
        orig = Engine.insert_df

        def insert_then_die(self, *a, **k):
            orig(self, *a, **k)
            os._exit(43)  # committed + epoch noted; checkpoint marker never lands
        Engine.insert_df = insert_then_die

    with open(os.path.join(src_dir, "f2.json"), "w") as f:
        for row in BATCH2:
            f.write(json.dumps(row) + "\n")
    run_available_now(eng, spark, src_dir, ckpt)  # batch 2: dies mid-flight
    os._exit(1)  # unreachable


if __name__ == "__main__":
    main()
