"""DistinctTransform — reference-counted multi-column DISTINCT as a
reactive derived table (extension; no analogue in the reference's
Transform enum, reactive_db/src/hooks/transforms/transform.rs:12-20).

Config::

    Derived:
      name: active_pairs
      transform_definition:
        DistinctTransform: {source_table: events, columns: [user_id, event_type]}

Declared semantics (documented, tested):

- the derived table holds ONE row per distinct live tuple of the
  projected ``columns``; tuple identity is the EXACT string form of
  each column (``cast("string")``, no normalization — unlike
  DedupTransform's lower/trim key) with NULL kept distinct from any
  string via a sentinel tag;
- the classic counted-projection of incremental view maintenance
  (Gupta & Mumick's bag-to-set Π): state carries a hidden per-tuple
  reference count (``_refCount``, a SYSTEM column — stripped from
  ``table()`` reads and from downstream transforms). Parent inserts
  increment, parent deletes decrement; downstream deltas fire ONLY on
  0↔1 transitions, so a tuple inserted a million times emits one child
  insert and its state row rewrites in place;
- **deletes never read the parent** — the refcount IS the sufficient
  summary (DedupTransform's delete path must re-scan affected keys to
  re-elect representatives; counted distinct has nothing to re-elect).
  Both directions are O(delta): one keyed count aggregation over the
  delta, one join against the affected state buckets;
- the visible row for a tuple is the FIRST ARRIVAL OF ITS CURRENT
  LIVE STREAK (lowest ``_seq`` since the refcount last rose from 0;
  entry-id tie-break) and carries that row's ``_sourceEntryId``
  provenance. Two deliberate consequences: (a) a PARTIAL delete that
  removes the original first-arrival parent row while the refcount
  stays >0 does NOT re-elect — projected values are identical by
  definition of the tuple key, and re-electing would force the delete
  path to read the parent, breaking the O(delta) no-parent-read
  design above, so the retained ``_sourceEntryId`` may reference a
  parent row that has since died; (b) after a tuple dies (refcount 0)
  and is later re-inserted, the NEW streak's first arrival is the
  representative — provenance never reaches back across a death.
  Within one commit, delete-then-insert
  (the reference's Update decomposition, database.rs:155-164) nets:
  old>0 → new==0 emits delete, old==0 → new>0 emits insert, otherwise
  nothing.

Scale shape: state is hash-bucket partitioned on the 16-byte tuple
hash like every keyed transform (commits rewrite only affected ``_kb``
dirs); all steps are keyed aggregations/joins on that hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from reactivedb_spark import constants as C
from reactivedb_spark.config import DistinctTransformConfig
from reactivedb_spark.errors import ConfigError

# NULL must stay distinct from every real string (including "NULL");
# the tag contains NUL bytes no fixture/text column can carry through
# the engine's typed columns without being a deliberate collision.
_NULL_TAG = "\x00∅\x00"
_SEP = "\x1f"


def key_expr(columns) -> F.Column:
    """Exact tuple identity: md5 over the sentinel-joined string forms.
    No normalization — DISTINCT is exact, per SQL semantics."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL_TAG)) for c in columns
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def output_schema(cfg: DistinctTransformConfig, parent: T.StructType) -> T.StructType:
    names = parent.fieldNames()
    if not cfg.columns:
        raise ConfigError("DistinctTransform: columns must be non-empty")
    if len(set(cfg.columns)) != len(cfg.columns):
        raise ConfigError(
            f"DistinctTransform: duplicate columns {list(cfg.columns)}"
        )
    for c in cfg.columns:
        if c not in names or c in C.SYSTEM_COLUMNS:
            raise ConfigError(
                f"DistinctTransform: column {c!r} not in parent schema"
            )
    fields = [
        T.StructField(C.ENTRY_ID, T.StringType(), False),
        T.StructField(C.SOURCE_ENTRY_ID, T.StringType(), True),
        T.StructField(C.SEQ, T.LongType(), False),
        T.StructField(C.DISTINCT_KEY, T.StringType(), True),
        T.StructField(C.REF_COUNT, T.LongType(), False),
    ]
    fields += [parent[c] for c in cfg.columns]
    return T.StructType(fields)


def delta_counts(cfg: DistinctTransformConfig, rows: DataFrame) -> DataFrame:
    """(distinctKey, _n) — tuple multiplicities within a delta. ONE
    map-side-combinable hash aggregation."""
    return (
        rows.select(key_expr(cfg.columns).alias(C.DISTINCT_KEY))
        .groupBy(C.DISTINCT_KEY)
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )


def representatives(cfg: DistinctTransformConfig, rows: DataFrame) -> DataFrame:
    """First arrival per tuple among ``rows`` (lowest ``_seq``, entry-id
    tie-break), in the child layout minus ``_entryId``/``_refCount``
    (the engine attaches both). One keyed window shuffle."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(C.DISTINCT_KEY).orderBy(C.SEQ, C.ENTRY_ID)
    return (
        rows.withColumn(C.DISTINCT_KEY, key_expr(cfg.columns))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(C.ENTRY_ID).alias(C.SOURCE_ENTRY_ID),
            F.col(C.SEQ),
            F.col(C.DISTINCT_KEY),
            *[F.col(c) for c in cfg.columns],
        )
    )
