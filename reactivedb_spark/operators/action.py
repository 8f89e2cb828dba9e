"""ActionTransform — user Python row/batch UDF.

Reference semantics (transform.rs:104-124; actions/action.rs:29-48): an
embedded CPython function is called once per row (GIL-bound), its returned
entry gets ``_sourceEntryId`` and is inserted into the derived table
(example: ``grade -= 10``, workspace/test_action.py:5-8).

Spark expression: Arrow-vectorized ``mapInPandas`` — batches cross the
JVM↔Python boundary as Arrow record batches instead of one FFI call per
row. Actions can be registered as:

- a **batch function** ``pd.DataFrame -> pd.DataFrame`` (preferred), or
- a **row function** ``dict -> dict`` (reference-style), auto-wrapped.

By default the output schema equals the parent's business schema (the
reference's test action mutates fields in place); actions that add/remove
columns declare ``output_columns``.
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass
from typing import Callable, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from reactivedb_spark import constants as C
from reactivedb_spark.config import ActionConfig, ActionTransformConfig
from reactivedb_spark.errors import ConfigError


@dataclass
class Action:
    name: str
    batch_fn: Callable[[pd.DataFrame], pd.DataFrame]
    output_columns: Optional[list] = None  # list[(name, DataType)] or None


def wrap_row_fn(name: str, row_fn: Callable[[dict], dict]) -> Callable[[pd.DataFrame], pd.DataFrame]:
    def batch(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([row_fn(dict(r)) for r in pdf.to_dict("records")])

    batch.__name__ = f"rowwise_{name}"
    return batch


def load_from_config(cfg: ActionConfig, workspace_dir: str | None = None) -> Action:
    """Import ``{file}.{function}`` like the reference's action registry
    (config_reader.rs:63-79). The function is treated as a row fn."""
    import sys

    if workspace_dir and workspace_dir not in sys.path:
        sys.path.insert(0, workspace_dir)
    mod = importlib.import_module(cfg.file)
    try:
        # workers won't have the workspace dir on sys.path — ship the
        # user's action module by value inside the task closures
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(mod)
    except Exception:
        pass
    fn = getattr(mod, cfg.function)
    return Action(cfg.name, wrap_row_fn(cfg.name, fn))


def output_schema(
    cfg: ActionTransformConfig, action: Action, parent: T.StructType
) -> T.StructType:
    fields = [
        T.StructField(C.ENTRY_ID, T.StringType(), False),
        T.StructField(C.SOURCE_ENTRY_ID, T.StringType(), True),
        T.StructField(C.SEQ, T.LongType(), False),
    ]
    if action.output_columns is not None:
        fields += [T.StructField(n, t, True) for n, t in action.output_columns]
    else:
        fields += [
            T.StructField(f.name, f.dataType, True)
            for f in parent.fields
            if f.name not in C.SYSTEM_COLUMNS
        ]
    return T.StructType(fields)


def apply_delta(
    cfg: ActionTransformConfig, action: Action, delta: DataFrame, out_schema: T.StructType
) -> DataFrame:
    out_fields = [f for f in out_schema.fields if f.name != C.ENTRY_ID]
    result_schema = T.StructType(out_fields)
    business = [f.name for f in out_fields if f.name not in C.SYSTEM_COLUMNS]
    # Capture only plain values/functions in the worker closure — no
    # package classes/exceptions, so workers never need to import
    # reactivedb_spark (it may not be on their sys.path).
    batch_fn = action.batch_fn
    action_name = action.name
    src_col, seq_col = C.SOURCE_ENTRY_ID, C.SEQ
    ordered = [f.name for f in out_fields]

    def run(batches):
        import pandas as _pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = batch_fn(pdf.drop(columns=[src_col, seq_col], errors="ignore"))
            if not isinstance(out, _pd.DataFrame):
                raise ValueError(f"action {action_name!r} must return a DataFrame")
            out = out.reindex(columns=business)
            out[src_col] = pdf[src_col].values
            out[seq_col] = pdf[seq_col].values
            yield out[ordered]

    prepared = delta.withColumn(C.SOURCE_ENTRY_ID, F.col(C.ENTRY_ID)).drop(C.ENTRY_ID)
    return prepared.mapInPandas(run, schema=result_schema)
