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


def stateful_timeout_sessions(stream_df: DataFrame, key_col: str,
                              us_col: str, gap_us: int):
    """Custom stateful SESSIONIZATION with EVENT-TIME TIMERS via
    ``applyInPandasWithState`` + ``GroupStateTimeout.EventTimeTimeout``
    — the timer-driven custom-operator class ``session_window`` (native,
    q_streaming_sessionize) cannot show: the OPEN session per key lives
    in explicit state and is emitted by the TIMEOUT callback once the
    watermark proves no more events can extend it.

    Per batch and key: the batch's event times are sorted and folded
    into the open session; any gap > ``gap_us`` CLOSES a session
    (emitted immediately) and opens the next. The surviving open
    session is stored and its timeout timestamp set to
    last_event + gap; when the event-time watermark passes that, Spark
    hands the group back with ``state.hasTimedOut`` and the final
    session is emitted. Exactly one emission per session, composition-
    deterministic as long as each key's batches arrive in event-time
    order (the replay guarantees it; out-of-order replays would need
    state to buffer — the documented trade of this operator class).

    ``us_col`` must be an int64 EPOCH-MICROSECOND column (the caller
    applies ``withWatermark`` on its companion timestamp column). The
    arithmetic deliberately avoids the timestamp column inside the UDF:
    Arrow localizes timestamps to the SESSION timezone on the pandas
    side while ``setTimeoutTimestamp`` expects UTC epoch ms — in a
    non-UTC session that silently shifts every timeout (measured:
    America/New_York pushed timeouts 4 h below the watermark and
    crashed the query). Integer microseconds are timezone-proof.

    Emits (key, session_start_us, session_end_us, n_events)."""
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            stream_df.schema[key_col],
            T.StructField("session_start_us", T.LongType()),
            T.StructField("session_end_us", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_us", T.LongType()),
            T.StructField("last_us", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )
    kcol, ucol, gap = key_col, us_col, int(gap_us)

    def update(key, pdfs, state: GroupState):
        import pandas as _pd

        def frame(sessions):
            return _pd.DataFrame(
                {kcol: [key[0]] * len(sessions),
                 "session_start_us": [s[0] for s in sessions],
                 "session_end_us": [s[1] for s in sessions],
                 "n_events": [s[2] for s in sessions]}
            )

        if state.hasTimedOut:
            st, last, n = state.get
            state.remove()
            yield frame([(st, last, n)])
            return
        ts = []
        for pdf in pdfs:
            ts.extend(int(x) for x in pdf[ucol])
        ts.sort()
        st, last, n = state.get if state.exists else (None, None, 0)
        closed = []
        for t in ts:
            if st is None:
                st, last, n = t, t, 1
            elif t - last > gap:
                closed.append((st, last, n))
                st, last, n = t, t, 1
            else:
                last, n = t, n + 1
        if st is not None:
            state.update((st, last, n))
            state.setTimeoutTimestamp(last // 1000 + gap // 1000 + 1)
        if closed:
            yield frame(closed)

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def tws_running_totals(stream_df: DataFrame, key_col: str, value_col: str):
    """Per-key running (count, sum) on Spark 4's ``transformWithState``
    API — the successor to ``applyInPandasWithState`` used by
    :func:`stateful_running_totals` (same declared semantics, so the two
    operators are mutually differential): typed per-key ValueState
    owned by a ``StatefulProcessor``, Arrow-batched rows, RocksDB-backed
    state (the API REQUIRES the RocksDB provider — run it under
    ``rocksdb_state``).

    ENVIRONMENT-GATED: transformWithState's state-server protocol needs
    the ``protobuf`` package on the Python side; this container doesn't
    ship it (and installs are out of scope), so the operator raises a
    clear error here and its test skips — the code path is exercised
    wherever protobuf exists. The applyInPandasWithState twin is the
    gated, oracle-checked operator in this environment
    (``streaming_stateful_totals``).

    Emits one row per key per batch: (key, n, total) after that batch's
    rows — identical to the applyInPandasWithState twin, so the same
    max/max_by fold and the same batch GROUP BY oracle apply. Integer
    value columns accumulate exactly (batch composition invisible)."""
    try:
        import google.protobuf  # noqa: F401 — the state-server protocol dep
    except ImportError as e:
        raise ImportError(
            "transformWithState requires the 'protobuf' package on the "
            "Python side (pyspark's state-server protocol); install it or "
            "use stateful_running_totals (applyInPandasWithState)"
        ) from e
    from pyspark.sql import types as T
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    vtype = stream_df.schema[value_col].dataType
    is_int = isinstance(vtype, (T.LongType, T.IntegerType))
    total_t = T.LongType() if is_int else T.DoubleType()
    out_schema = T.StructType([
        stream_df.schema[key_col],
        T.StructField("n", T.LongType()),
        T.StructField("total", total_t),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType()), T.StructField("total", total_t),
    ])
    kcol, vcol = key_col, value_col
    zero = 0 if is_int else 0.0
    conv = int if is_int else float

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as _pd

            prior = self._state.get() if self._state.exists() else None
            n, total = (prior[0], prior[1]) if prior is not None else (0, zero)
            for pdf in rows:
                n += len(pdf)
                total += conv(pdf[vcol].sum())
            self._state.update((n, total))
            yield _pd.DataFrame({kcol: [key[0]], "n": [n], "total": [total]})

        def close(self) -> None:
            pass

    return stream_df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
