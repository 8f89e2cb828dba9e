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


def snapshot_diff(
    before: DataFrame,
    after: DataFrame,
    key: str,
    payload_cols: list[str],
) -> DataFrame:
    """Keyed table diff — the warehouse regression-test primitive:
    classify every key as added / removed / changed between two
    snapshots, with the names of the differing payload columns
    (comma-joined in column order; NULL-safe comparison, so NULL->value
    and value->NULL both count as changes). Unchanged keys are omitted.

    One full outer join on the key; the per-column compare is a codegen
    CASE chain — no row explosion, no driver state."""
    b = before.select(
        F.col(key).alias("_bk"),
        *[F.col(c).alias(f"_b_{c}") for c in payload_cols])
    a = after.select(
        F.col(key).alias("_ak"),
        *[F.col(c).alias(f"_a_{c}") for c in payload_cols])
    j = b.join(a, b["_bk"] == a["_ak"], "full_outer")
    changed_cols = F.concat_ws(",", *[
        F.when(~F.col(f"_b_{c}").eqNullSafe(F.col(f"_a_{c}")), F.lit(c))
        for c in payload_cols
    ])
    change = (
        F.when(F.col("_bk").isNull(), F.lit("added"))
        .when(F.col("_ak").isNull(), F.lit("removed"))
        .when(changed_cols != F.lit(""), F.lit("changed"))
    )
    return (
        j.select(
            F.coalesce(F.col("_bk"), F.col("_ak")).alias(key),
            change.alias("change"),
            F.when(change == "changed", changed_cols)
            .otherwise(F.lit("")).alias("changed_cols"),
        )
        .filter(F.col("change").isNotNull())
    )
