"""Streaming mode: file-source micro-batches drive the reactive DAG and
listeners see the same events the batch engine would emit
(SURVEY.md §2.3 Listen / §3.3)."""

import time

import pytest
from pyspark.sql import functions as F, types as T

from reactivedb_spark import Engine
from reactivedb_spark.sources import stream_parquet_dir
from reactivedb_spark.streaming import stream_into, windowed_counts

CFG = {
    "tables": [
        {"Source": {"name": "events", "columns": {
            "event_id": "Integer", "user_id": "Integer", "value": "Float"}}},
        {"Derived": {"name": "big_events",
                     "transform_definition": {"FilterTransform": {
                         "source_table": "events", "filter": "value > 10.0"}}}},
        {"Derived": {"name": "per_user",
                     "transform_definition": {"AggregationTransform": {
                         "source_table": "events",
                         "aggregated_column": "user_id",
                         "functions": ["n ~ memo.n + 1", "total ~ memo.total + value"]}}}},
    ]
}

SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("value", T.DoubleType()),
])


class TestStreamInto:
    def test_microbatches_propagate_and_notify(self, spark, tmp_path):
        eng = Engine(spark, CFG, workspace=str(tmp_path / "ws"))
        insert_events, delete_events = [], []
        eng.listen("big_events", "Insert", lambda df: insert_events.append(df.count()))
        eng.listen("per_user", "Insert", lambda df: insert_events.append(df.count()))

        src_dir = tmp_path / "incoming"
        src_dir.mkdir()
        # three files → three micro-batches (maxFilesPerTrigger=1)
        rows = [(i, i % 3, float(i)) for i in range(30)]
        for b in range(3):
            spark.createDataFrame(rows[b * 10:(b + 1) * 10], SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(str(src_dir))

        stream = stream_parquet_dir(spark, str(src_dir), SCHEMA)
        q = stream_into(eng, "events", stream,
                        checkpoint_dir=str(tmp_path / "ckpt"))
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        assert eng.table("events").count() == 30
        big = eng.table("big_events")
        assert big.count() == 19  # values 11..29
        per_user = {r["aggregatedColumn"]: (r["n"], r["total"])
                    for r in eng.table("per_user").collect()}
        assert per_user[0] == (10, sum(float(i) for i in range(0, 30, 3)))
        assert len(per_user) == 3
        # listener saw at least one batch per derived table, totals match
        assert sum(insert_events) >= 19 + 3

    def test_windowed_counts_with_watermark(self, spark, tmp_path):
        src_dir = tmp_path / "wm"
        src_dir.mkdir()
        base = 1_700_000_000
        rows = [(i, "a" if i % 2 else "b", base + i * 600) for i in range(12)]
        df = spark.createDataFrame(rows, "id long, k string, epoch long").withColumn(
            "ts", F.col("epoch").cast("timestamp")
        )
        df.coalesce(1).write.mode("append").parquet(str(src_dir))
        schema = df.schema

        stream = stream_parquet_dir(spark, str(src_dir), schema,
                                    max_files_per_trigger=None)
        agg = windowed_counts(stream, "ts", "k", window="1 hour",
                              watermark="10 minutes")
        q = (agg.writeStream.outputMode("complete")
             .format("memory").queryName(f"wm_{int(time.time())}").start())
        try:
            q.processAllAvailable()
            name = q.name
        finally:
            q.stop()
        out = spark.sql(f"SELECT * FROM {name}").collect()
        assert sum(r["n"] for r in out) == 12
        assert {r["k"] for r in out} == {"a", "b"}


class TestReplayIdempotence:
    def test_checkpoint_replay_does_not_double_count(self, spark, tmp_path):
        """Crash window: engine commit lands but the checkpoint's commit
        marker does not. On restart Spark replays the epoch; the store's
        epoch ledger (persisted atomically with the commit) must skip it."""
        import os

        eng = Engine(spark, CFG, workspace=str(tmp_path / "ws"))
        src_dir = tmp_path / "incoming"
        src_dir.mkdir()
        rows = [(i, i % 3, float(i)) for i in range(30)]
        for b in range(3):
            spark.createDataFrame(rows[b * 10:(b + 1) * 10], SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(str(src_dir))
        ckpt = str(tmp_path / "ckpt")
        q = stream_into(eng, "events", stream_parquet_dir(spark, str(src_dir), SCHEMA),
                        checkpoint_dir=ckpt)
        q.processAllAvailable()
        q.stop()
        for _ in range(100):  # stop() is async; wait for full teardown
            if not q.isActive:
                break
            time.sleep(0.1)
        before = {r["aggregatedColumn"]: (r["n"], r["total"])
                  for r in eng.table("per_user").collect()}
        assert sum(n for n, _t in before.values()) == 30

        # simulate the crash: drop the newest checkpoint commit marker so
        # the restarted query re-runs that epoch
        commits = sorted(
            f for f in os.listdir(os.path.join(ckpt, "commits")) if not f.startswith(".")
        )
        os.remove(os.path.join(ckpt, "commits", commits[-1]))
        crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
        if os.path.exists(crc):  # hadoop local FS keeps a checksum twin
            os.remove(crc)

        q2 = stream_into(eng, "events", stream_parquet_dir(spark, str(src_dir), SCHEMA),
                         checkpoint_dir=ckpt)
        q2.processAllAvailable()
        q2.stop()
        after = {r["aggregatedColumn"]: (r["n"], r["total"])
                 for r in eng.table("per_user").collect()}
        assert after == before, "replayed epoch was double-counted"

    def test_recreated_checkpoint_same_path_starts_fresh_ledger(self, spark, tmp_path):
        """Deleting and recreating a checkpoint at the SAME path restarts
        Spark's epoch ids at 0 while the persisted ledger still holds the
        old high-water mark. The ledger key includes the streaming query id
        (from <checkpoint>/metadata), so the new incarnation must process
        its batches instead of silently dropping them as 'replays'."""
        import shutil

        eng = Engine(spark, CFG, workspace=str(tmp_path / "ws"))
        src_dir = tmp_path / "incoming"
        src_dir.mkdir()
        rows = [(i, i % 3, float(i)) for i in range(30)]
        for b in range(3):
            spark.createDataFrame(rows[b * 10:(b + 1) * 10], SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(str(src_dir))
        ckpt = str(tmp_path / "ckpt")
        q = stream_into(eng, "events", stream_parquet_dir(spark, str(src_dir), SCHEMA),
                        checkpoint_dir=ckpt)
        q.processAllAvailable()
        q.stop()
        assert eng.table("events").count() == 30

        # operator error / intentional reset: checkpoint wiped, same path
        shutil.rmtree(ckpt)
        q2 = stream_into(eng, "events", stream_parquet_dir(spark, str(src_dir), SCHEMA),
                         checkpoint_dir=ckpt)
        q2.processAllAvailable()
        q2.stop()
        # the fresh incarnation re-reads the source from scratch: its
        # batches MUST commit (30 new rows), not be dropped by the ledger
        assert eng.table("events").count() == 60


def test_tws_running_totals_matches_apply_in_pandas_twin(spark, tmp_path):
    """transformWithState twin of stateful_running_totals — SKIPS where
    protobuf (the state-server protocol dep) is absent; asserts the two
    stateful APIs agree where it runs."""
    import pytest as _pytest

    _pytest.importorskip("google.protobuf")
    import os as _os

    from pyspark.sql import functions as F

    from reactivedb_spark.sources.readers import stream_parquet_dir
    from reactivedb_spark.streaming.listen import (
        stateful_running_totals, tws_running_totals)
    from reactivedb_spark.suite._common import rocksdb_state, streaming_shuffle

    src = str(tmp_path / "in")
    spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    ).repartition(2).write.mode("append").parquet(src)
    outs = {}
    for label, fn in (("apply", stateful_running_totals),
                      ("tws", tws_running_totals)):
        name = f"tws_twin_{label}"
        df = fn(stream_parquet_dir(
            spark, src, "k bigint, v bigint"), "k", "v")
        with streaming_shuffle(spark), rocksdb_state(spark):
            q = (df.writeStream.format("memory").queryName(name)
                 .outputMode("update")
                 .option("checkpointLocation", str(tmp_path / f"ck_{label}"))
                 .trigger(availableNow=True).start())
            q.awaitTermination()
            q.stop()
        outs[label] = {
            r["k"]: (r["n"], r["total"]) for r in
            spark.table(name).groupBy("k").agg(
                F.max("n").alias("n"), F.max_by("total", "n").alias("total")
            ).collect()}
    assert outs["apply"] == outs["tws"]


def test_tws_running_totals_raises_clearly_without_protobuf(spark, tmp_path):
    try:
        import google.protobuf  # noqa: F401
        import pytest as _pytest

        _pytest.skip("protobuf present: the gate is exercised by the twin test")
    except ImportError:
        pass
    import pytest as _pytest

    from pyspark.sql import functions as F

    from reactivedb_spark.sources.readers import stream_parquet_dir
    from reactivedb_spark.streaming.listen import tws_running_totals

    src = str(tmp_path / "in")
    spark.range(10).select(
        (F.col("id") % 2).alias("k"), F.col("id").alias("v")
    ).write.mode("append").parquet(src)
    with _pytest.raises(ImportError, match="protobuf"):
        tws_running_totals(
            stream_parquet_dir(spark, src, "k bigint, v bigint"), "k", "v")
