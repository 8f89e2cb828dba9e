"""Streaming mode: Structured Streaming drives the reactive DAG.

The reference pushes every insert through the derived-table DAG eagerly
and streams Insert/Delete events to subscribed clients
(listener_hook.rs:56-84; SURVEY.md §2.3 / §3.3). Spark's natural shape
for the same semantics is micro-batch: a streaming source feeds
``foreachBatch``, each batch runs one engine commit (insert → topological
DAG propagation → listener callbacks). Listeners therefore see exactly
the reference's event stream, batched: per-batch at-least-once, in commit
order — the declared contract (SURVEY.md §7 hard-problem #5; the
reference itself is best-effort per row, listener_hook.rs:81 ignores send
errors).

Also provided: a watermarked tumbling-window aggregation helper — the
event-time operator class the reference lacks entirely (SURVEY.md §2.4
"absent operator classes"), exposed as a first-class streaming feature.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from reactivedb_spark.engine import Engine


def stream_into(engine: Engine, table: str, stream_df: DataFrame,
                checkpoint_dir: Optional[str] = None,
                trigger_once: bool = False) -> StreamingQuery:
    """Feed a streaming DataFrame into a source table: each micro-batch is
    one engine commit (insert → DAG propagation → listen events).

    Exactly-once: when a checkpoint is configured, the epoch id is
    recorded in the store's meta atomically with the commit (the Delta
    txnAppId/txnVersion pattern), so a replayed epoch after a crash
    between our commit and the checkpoint's commit marker is skipped
    instead of double-counted. The ledger key is scoped to
    (table, checkpoint path, streaming query id) — the query id comes
    from ``<checkpoint>/metadata``, which Spark rewrites with a fresh
    uuid whenever the checkpoint is recreated, so a deleted-and-recreated
    checkpoint at the SAME path starts a fresh ledger (its epoch ids
    restart at 0; a path-only key would make every new batch look like a
    replay of the old high-water mark and silently drop it)."""
    import hashlib as _hashlib
    import json as _json
    import os as _os

    _key_cache: list = []

    def epoch_key() -> Optional[str]:
        """Resolved lazily (inside the first batch): Spark writes
        ``<checkpoint>/metadata`` at query start, before any batch runs."""
        if checkpoint_dir is None:
            return None
        if _key_cache:
            return _key_cache[0]
        qid = ""
        try:
            local = checkpoint_dir.removeprefix("file://").removeprefix("file:")
            with open(_os.path.join(local, "metadata")) as f:
                qid = _json.load(f).get("id", "")
        except (OSError, ValueError):
            qid = ""  # non-local checkpoint FS: path-only key (documented caveat)
        key = (
            "stream:" + table + ":"
            + _hashlib.md5(f"{checkpoint_dir}|{qid}".encode()).hexdigest()[:12]
        )
        if qid:  # only cache a fully-resolved key
            _key_cache.append(key)
        return key

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        key = epoch_key()
        if key is not None:
            last = engine.store.last_epoch(key)
            if last is not None and epoch_id <= last:
                return  # checkpoint replay of an already-committed epoch
        if batch_df.isEmpty():
            return
        engine.insert_df(
            table, batch_df,
            epoch=(key, epoch_id) if key is not None else None,
        )

    writer = stream_df.writeStream.foreachBatch(handle)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stateful_running_totals(stream_df: DataFrame, key_col: str, value_col: str):
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-key running (count, sum) maintained across micro-batches — the
    Spark-native analogue of the reference's per-key incremental
    aggregation state (transform.rs:229-275), but with explicit state
    ownership, timeouts available, and Arrow-batched updates.

    Emits one row per key per batch: (key, n, total).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    # integer value columns accumulate exactly (batch composition can
    # never change the total); double stays double for float feeds
    vtype = stream_df.schema[value_col].dataType
    is_int = isinstance(vtype, (T.LongType, T.IntegerType))
    total_t = T.LongType() if is_int else T.DoubleType()
    out_schema = T.StructType(
        [
            stream_df.schema[key_col],
            T.StructField("n", T.LongType()),
            T.StructField("total", total_t),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("total", total_t)]
    )
    vcol = value_col
    kcol = key_col
    zero = 0 if is_int else 0.0
    conv = int if is_int else float

    def update(key, pdfs, state: GroupState):
        import pandas as _pd

        n, total = state.get if state.exists else (0, zero)
        for pdf in pdfs:
            n += len(pdf)
            total += conv(pdf[vcol].sum())
        state.update((n, total))
        yield _pd.DataFrame({kcol: [key[0]], "n": [n], "total": [total]})

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def windowed_counts(stream_df: DataFrame, ts_col: str, key_col: str,
                    window: str = "1 hour", watermark: str = "10 minutes",
                    value_col: Optional[str] = None) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream —
    late rows beyond the watermark are dropped deterministically."""
    aggs = [F.count("*").alias("n")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(*aggs)
    )
