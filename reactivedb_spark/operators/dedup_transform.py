"""DedupTransform — exact dedup as a reactive derived table.

The first extension transform exposed through the reference's YAML
config surface (SURVEY.md §7 phase 6: "each as a new TransformType in
the same config surface"; no analogue in the reference's Transform enum,
reactive_db/src/hooks/transforms/transform.rs:12-20). Config::

    Derived:
      name: unique_docs
      transform_definition:
        DedupTransform: {source_table: documents, key: body}

Declared semantics (documented, tested):

- identity = ``md5(lower(trim(key)))`` of the key column (string-
  normalized; non-string keys go through their string form);
- **first writer wins**: the representative for a key is the live
  parent row with the lowest ``_seq`` (arrival order); later arrivals
  of the same key change nothing;
- parent deletes cascade by provenance; a key whose representative was
  deleted re-derives its representative from the remaining parent rows
  (or disappears) — downstream tables see delete+insert, exactly like
  the reference's Update decomposition;
- output carries all parent business columns plus ``dedupKey`` and the
  ``_sourceEntryId`` provenance pointer.

Scale shape: inserts are O(delta) — the delta's own representatives
anti-join the affected state buckets on the hash key (no parent
rescan); only the deletes path re-reads the parent, restricted to the
keys that lost their representative. State is hash-bucket partitioned
on ``dedupKey`` like Union/Aggregation state, so lookups and commits
prune partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from reactivedb_spark import constants as C
from reactivedb_spark.config import DedupTransformConfig
from reactivedb_spark.errors import ConfigError


def key_expr(key_column: str):
    """Normalized dedup identity: md5 of lower(trim(string form))."""
    return F.md5(F.lower(F.trim(F.col(key_column).cast("string"))))


def output_schema(cfg: DedupTransformConfig, parent: T.StructType) -> T.StructType:
    if cfg.key not in parent.fieldNames() or cfg.key in C.SYSTEM_COLUMNS:
        raise ConfigError(
            f"DedupTransform: key column {cfg.key!r} not in parent schema"
        )
    fields = [
        T.StructField(C.ENTRY_ID, T.StringType(), False),
        T.StructField(C.SOURCE_ENTRY_ID, T.StringType(), True),
        T.StructField(C.SEQ, T.LongType(), False),
        T.StructField(C.DEDUP_KEY, T.StringType(), True),
    ]
    fields += [f for f in parent.fields if f.name not in C.SYSTEM_COLUMNS]
    return T.StructType(fields)


def representatives(cfg: DedupTransformConfig, parent_rows: DataFrame) -> DataFrame:
    """One representative per key among ``parent_rows``: lowest ``_seq``
    (entry-id tie-break for determinism). One keyed window shuffle on
    the hash key — the same economics as any groupBy."""
    from pyspark.sql.window import Window

    data_cols = [
        f.name for f in parent_rows.schema.fields if f.name not in C.SYSTEM_COLUMNS
    ]
    w = Window.partitionBy(C.DEDUP_KEY).orderBy(C.SEQ, C.ENTRY_ID)
    return (
        parent_rows.withColumn(C.DEDUP_KEY, key_expr(cfg.key))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(C.ENTRY_ID).alias(C.SOURCE_ENTRY_ID),
            F.col(C.SEQ),
            F.col(C.DEDUP_KEY),
            *data_cols,
        )
    )
