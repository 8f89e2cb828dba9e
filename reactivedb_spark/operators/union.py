"""UnionTransform — N-way merge-by-key with per-column last-writer-wins.

Reference semantics (transform.rs:176-228; README.md:51-59): each arriving
row from any of N parent tables is looked up in the derived table by
``matchingKey == row[fk]``; on hit, arriving columns overwrite
(last-writer-wins **per column**); on miss, a new row keyed by
``matchingKey`` is inserted (the fk column itself is renamed away,
transform.rs:209-215). Implemented in the reference as Update =
delete-on-matchingKey + insert (transform.rs:54-81).

Spark expression: normalize every parent delta to the merged schema
(fk → ``matchingKey``), union them with the previous state, and take, per
column, the value carried by the highest ``_seq`` among non-null writers:
``max(struct(seq-if-notnull, value)).value``. One hash aggregation on the
key — a single shuffle, AQE-coalesced; at scale the state side would be a
Delta MERGE on a table partitioned/bucketed by ``matchingKey``.

Declared deviations (SURVEY.md Appendix A #8): a missing/null foreign key
uses NULL ``matchingKey`` and such rows never merge (the reference used a
magic sentinel string, transform.rs:76).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from reactivedb_spark import constants as C
from reactivedb_spark.config import UnionTransformConfig
from reactivedb_spark.errors import ConfigError


def _business(schema: T.StructType) -> list[T.StructField]:
    return [f for f in schema.fields if f.name not in C.SYSTEM_COLUMNS]


def output_schema(cfg: UnionTransformConfig, parents: dict[str, T.StructType]) -> T.StructType:
    key_types = []
    merged: dict[str, T.DataType] = {}
    for table, fk in cfg.tables_and_foreign_keys:
        ps = parents[table]
        if fk not in ps.fieldNames():
            raise ConfigError(f"union fk column {fk!r} not in table {table!r}")
        key_types.append(ps[fk].dataType)
        for f in _business(ps):
            if f.name == fk:
                continue
            if f.name in merged and merged[f.name] != f.dataType:
                raise ConfigError(
                    f"union column {f.name!r} has conflicting types "
                    f"{merged[f.name]} vs {f.dataType}"
                )
            merged[f.name] = f.dataType
    kt0 = key_types[0]
    if any(kt != kt0 for kt in key_types):
        raise ConfigError(f"union foreign keys must share a type, got {key_types}")
    fields = [
        T.StructField(C.ENTRY_ID, T.StringType(), False),
        T.StructField(C.SOURCE_ENTRY_ID, T.StringType(), True),
        T.StructField(C.SEQ, T.LongType(), False),
        T.StructField(C.MATCHING_KEY, kt0, True),
    ]
    fields += [T.StructField(n, t, True) for n, t in merged.items()]
    return T.StructType(fields)


def normalize_delta(
    cfg: UnionTransformConfig,
    parent_name: str,
    delta: DataFrame,
    out_schema: T.StructType,
) -> DataFrame:
    """Project a parent delta onto the merged schema: fk → matchingKey,
    ``_sourceEntryId`` = parent ``_entryId``, absent columns NULL."""
    fk = dict(cfg.tables_and_foreign_keys)[parent_name]
    present = set(delta.columns)
    cols = []
    for f in out_schema.fields:
        if f.name == C.ENTRY_ID:
            continue  # assigned at commit
        if f.name == C.SOURCE_ENTRY_ID:
            cols.append(F.col(C.ENTRY_ID).alias(C.SOURCE_ENTRY_ID))
        elif f.name == C.SEQ:
            cols.append(F.col(C.SEQ))
        elif f.name == C.MATCHING_KEY:
            cols.append(F.col(fk).alias(C.MATCHING_KEY))
        elif f.name in present:
            cols.append(F.col(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return delta.select(*cols)


def merge(state: DataFrame, incoming: DataFrame, out_schema: T.StructType) -> DataFrame:
    """Merge normalized incoming rows into the current merged state.

    Both inputs carry the merged schema minus ``_entryId``. All incoming
    ``_seq`` values exceed all state ``_seq`` values (the engine's global
    sequence), so per-column last-writer-wins reduces to
    ``max(struct(seq-if-value-not-null, value)).value`` per key: Spark
    orders struct fields left-to-right with NULL smallest, so the newest
    non-null write wins and all-null stays null.
    """
    value_cols = [
        f.name
        for f in out_schema.fields
        if f.name not in (C.ENTRY_ID, C.SOURCE_ENTRY_ID, C.SEQ, C.MATCHING_KEY)
    ]
    combined = state.unionByName(incoming)
    keyed = combined.filter(F.col(C.MATCHING_KEY).isNotNull())
    unkeyed = combined.filter(F.col(C.MATCHING_KEY).isNull())

    aggs = [
        F.max(F.struct(F.col(C.SEQ).alias("s"), F.col(C.SOURCE_ENTRY_ID).alias("v")))["v"].alias(
            C.SOURCE_ENTRY_ID
        ),
        F.max(C.SEQ).alias(C.SEQ),
    ]
    for name in value_cols:
        aggs.append(
            F.max(
                F.struct(
                    F.when(F.col(name).isNotNull(), F.col(C.SEQ)).alias("s"),
                    F.col(name).alias("v"),
                )
            )["v"].alias(name)
        )
    merged = keyed.groupBy(C.MATCHING_KEY).agg(*aggs)
    ordered = [f.name for f in out_schema.fields if f.name != C.ENTRY_ID]
    return merged.select(*ordered).unionByName(unkeyed.select(*ordered))
