"""Round-13 fixes, each pinned by a test (ADVICE r12):

1. store — ParquetSnapshotStore has NO bare append(): every file-landing
   path must end in save_meta (via end_commit), or _recover() would reap
   the durably-written files as orphans on the next open (ADVICE r12 #1).
2. aggregation merge — the incremental decomposable merge applies the
   fold contract's per-add decimal(19,9) operand coercion to the
   old+delta add, matching compute_groups: an out-of-range prior memo
   NULLs instead of silently keeping full-precision state (ADVICE r12 #2).
3. internal-column collision — aggregation dests named `_k`, `_matched`,
   or `_o_*` are rejected at config time instead of surfacing as an
   ambiguous-reference AnalysisException inside the merge join
   (ADVICE r12 #3).
4. end_commit ordering — nothing is deleted until AFTER the save_meta
   pointer flip: a crash mid-end_commit rolls back cleanly AND keeps the
   read_at(current-1) time-travel window (ADVICE r12 #4).
"""

from decimal import Decimal

import pytest
from pyspark.sql import types as T

from reactivedb_spark import constants as C
from reactivedb_spark.config import parse_transform
from reactivedb_spark.errors import ConfigError
from reactivedb_spark.expr.parser import parse_statement
from reactivedb_spark.operators import aggregation
from reactivedb_spark.store import ParquetSnapshotStore


# -- 1. no bare append(): the save_meta invariant has no bypass ----------

def test_store_has_no_bare_append():
    assert not hasattr(ParquetSnapshotStore, "append")
    assert hasattr(ParquetSnapshotStore, "append_delta")


# -- 2. merge applies the per-add decimal(19,9) coercion -----------------

PARENT = T.StructType([
    T.StructField(C.ENTRY_ID, T.StringType()),
    T.StructField(C.SEQ, T.LongType()),
    T.StructField("k", T.StringType()),
    T.StructField("price", T.DecimalType(19, 9)),
])


def _decimal_cfg():
    from reactivedb_spark.config import AggregationTransformConfig

    return AggregationTransformConfig(
        "src", "k", (parse_statement("s ~ memo.s + price"),)
    )


def test_merge_decimal_old_state_coerces_like_the_fold(spark):
    cfg = _decimal_cfg()
    mt = aggregation.memo_types(cfg, PARENT)["s"]
    assert isinstance(mt, T.DecimalType)

    state_schema = T.StructType([
        T.StructField(C.AGGREGATED_COLUMN, T.StringType()),
        T.StructField("s", mt),
    ])
    delta_schema = T.StructType([
        T.StructField(C.SOURCE_ENTRY_ID, T.StringType()),
        T.StructField(C.SEQ, T.LongType()),
        T.StructField(C.AGGREGATED_COLUMN, T.StringType()),
        T.StructField("s", mt),
    ])
    state = spark.createDataFrame(
        [("ok", Decimal("5.5")),
         # representable at mt but OUT of the fold's (19,9) operand range:
         # the sequential fold would have NULLed the memo at this point,
         # so the merge must yield NULL, not 10000000000.5 + delta.
         ("over", Decimal("10000000000.5"))],
        state_schema,
    )
    delta = spark.createDataFrame(
        [("e1", 10, "ok", Decimal("2.25")),
         ("e2", 11, "over", Decimal("1")),
         ("e3", 12, "fresh", Decimal("3"))],
        delta_schema,
    )
    out = {r[C.AGGREGATED_COLUMN]: r["s"]
           for r in aggregation.merge_with_state(cfg, state, delta, PARENT).collect()}
    assert out["ok"] == Decimal("7.75")
    assert out["over"] is None
    assert out["fresh"] == Decimal("3")


# -- 3. internal merge-column names rejected at config time --------------

@pytest.mark.parametrize("dest", ["_k", "_matched", "_o_s"])
def test_internal_dest_names_rejected(dest):
    spec = {"AggregationTransform": {
        "source_table": "src", "aggregated_column": "k",
        "functions": [f"{dest} ~ memo.{dest} + 1"]}}
    with pytest.raises(ConfigError, match="collides with internal"):
        parse_transform(spec, "t")


def test_normal_dest_names_still_accepted():
    # names merely CONTAINING the internal words are fine
    spec = {"AggregationTransform": {
        "source_table": "src", "aggregated_column": "k",
        "functions": ["o_matched ~ memo.o_matched + 1"]}}
    parse_transform(spec, "t")


# -- 4. end_commit deletes nothing before the pointer flip ---------------

def test_crash_mid_end_commit_keeps_time_travel_window(spark, workspace, monkeypatch):
    schema = T.StructType([T.StructField("x", T.LongType())])
    st = ParquetSnapshotStore(spark, workspace)
    st.init_table("t", schema)
    st.replace("t", spark.createDataFrame([(1,)], schema))  # v1
    st.replace("t", spark.createDataFrame([(2,)], schema))  # v2 (v1 retained)
    st.save_meta()

    st.begin_commit()
    st.replace("t", spark.createDataFrame([(3,)], schema))  # v3, queues v1 rm
    monkeypatch.setattr(st, "save_meta",
                        lambda: (_ for _ in ()).throw(OSError("disk gone")))
    with pytest.raises(OSError):
        st.end_commit()
    monkeypatch.undo()

    import os
    # the retained v1 dir must still exist: deletion is ordered AFTER the
    # durable pointer flip, which never happened.
    assert os.path.isdir(os.path.join(workspace, "t", "v000001"))

    # a fresh open recovers the exact pre-commit snapshot, INCLUDING the
    # one-back time-travel window.
    st2 = ParquetSnapshotStore(spark, workspace)
    st2._schemas["t"] = schema
    assert [r.x for r in st2.read("t").collect()] == [2]
    assert [r.x for r in st2.read_at("t", st2._versions["t"] - 1).collect()] == [1]
    assert not os.path.isdir(os.path.join(workspace, "t", "v000003"))


def test_successful_end_commit_still_reaps_pending(spark, workspace):
    import os

    schema = T.StructType([T.StructField("x", T.LongType())])
    st = ParquetSnapshotStore(spark, workspace + "_ok")
    st.init_table("t", schema)
    st.replace("t", spark.createDataFrame([(1,)], schema))  # v1
    st.replace("t", spark.createDataFrame([(2,)], schema))  # v2
    st.begin_commit()
    st.replace("t", spark.createDataFrame([(3,)], schema))  # v3, queues v1
    st.end_commit()
    assert not os.path.isdir(os.path.join(workspace + "_ok", "t", "v000001"))
    assert [r.x for r in st.read("t").collect()] == [3]
