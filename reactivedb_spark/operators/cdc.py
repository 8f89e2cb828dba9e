"""Changelog application (MERGE INTO / CDC-apply semantics).

Applies an ordered changelog of upsert/delete operations to a keyed
snapshot — the batch analogue of the reference engine's
insert-then-cascade path (reference semantics: InsertData/DeleteData,
reactive_db transform_hook insert/delete envelopes) and the core of
every warehouse MERGE/CDC ingestion job.

Semantics: for each key, changelog entries are ordered by
(seq_cols...); the LAST entry wins. A final ``upsert`` sets the payload
(inserting the key if the snapshot lacks it); a final ``delete``
removes the key; keys with no changelog entries pass through unchanged.

Spark-first shape: one window row_number per key over the changelog
(descending seq, keep 1) — NOT a groupBy-max + re-join — then a single
full outer join against the snapshot. Two shuffles on the key, both
AQE-coalescible; at 100 TB the changelog is typically << snapshot and
its shuffled side is small. No driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def apply_changelog(
    snapshot: DataFrame,
    changelog: DataFrame,
    key: str,
    payload_cols: list[str],
    op_col: str = "op",
    seq_cols: list[str] | None = None,
) -> DataFrame:
    """Apply ``changelog`` (key, op in {'upsert','delete'}, seq_cols...,
    payload_cols...) to ``snapshot`` (key, payload_cols...). Returns the
    post-merge snapshot with schema (key, payload_cols...)."""
    seq = seq_cols or []
    w = Window.partitionBy(key).orderBy(
        *[F.col(c).desc() for c in seq], F.col(op_col).asc())
    last = (
        changelog.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(key, op_col, *payload_cols)
    )
    snap = snapshot.select(
        F.col(key).alias("_k"),
        *[F.col(c).alias(f"_s_{c}") for c in payload_cols],
    )
    merged = last.join(snap, last[key] == snap["_k"], "full_outer")
    alive = merged.filter(
        F.col(op_col).isNull() | (F.col(op_col) == F.lit("upsert")))
    out = alive.select(
        F.coalesce(F.col(key), F.col("_k")).alias(key),
        *[
            F.when(F.col(op_col) == "upsert", F.col(c))
            .otherwise(F.col(f"_s_{c}"))
            .alias(c)
            for c in payload_cols
        ],
    )
    return out
