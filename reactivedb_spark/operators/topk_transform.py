"""TopKTransform — incrementally maintained per-group top-k derived
table (extension; no analogue in the reference's Transform enum,
reactive_db/src/hooks/transforms/transform.rs:12-20 — its only keyed
reactive operators are the LWW Union and the memo-fold Aggregation).

Config::

    Derived:
      name: top_orders
      transform_definition:
        TopKTransform: {source_table: orders, group_by: priority,
                        order_by: totalprice, k: 5, descending: true}

Declared semantics (documented, tested):

- the derived table holds, for every distinct ``group_by`` value, the
  ``k`` live parent rows ranking highest by ``order_by`` (``descending``
  flips to lowest-first); ties on ``order_by`` break by arrival order
  (lowest ``_seq`` wins — exactly one row per ``_seq`` per table, so the
  rank is total and deterministic);
- rows carry NO rank column: membership is the maintained fact. Storing
  ranks would turn every insert that shifts a rank into k rewrites;
  consumers that need ranks compute them at read time with a window;
- group identity is ``md5(lower(trim(string form)))`` of the group
  column (the DedupTransform key convention); the typed group column
  itself stays among the data columns.

Incremental maintenance (the top-k monotonicity argument):

- **inserts are O(delta)** and never rescan the parent:
  top-k(S ∪ Δ) = top-k(top-k(S) ∪ Δ), so the committed child state of
  the delta's groups IS a sufficient summary. The delta unions the
  affected groups' current members, one keyed window ranks them, rows
  that fall out become cascading child DELETES (downstream sees
  delete+insert, the reference's Update decomposition);
- **parent deletes** cascade by provenance, then only the groups that
  lost a member refill from the (already committed) parent state,
  restricted to those groups. Survivors can never be evicted by a
  refill — top-k of a subset keeps every surviving member — so the
  refill emits inserts only.

Scale shape: state is hash-bucket partitioned on the group key like
Union/Aggregation/Dedup state (commits rewrite only affected ``_kb``
dirs); every step is a keyed window or equi-join on the 16-byte group
hash; state is ≤ k rows per live group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from reactivedb_spark import constants as C
from reactivedb_spark.config import TopKTransformConfig
from reactivedb_spark.errors import ConfigError


def key_expr(group_column: str):
    """Group identity: md5 of lower(trim(string form)) — the
    DedupTransform normalization, shared so both keyed extension
    transforms bucket identically."""
    return F.md5(F.lower(F.trim(F.col(group_column).cast("string"))))


def output_schema(cfg: TopKTransformConfig, parent: T.StructType) -> T.StructType:
    names = parent.fieldNames()
    for col, what in ((cfg.group_by, "group_by"), (cfg.order_by, "order_by")):
        if col not in names or col in C.SYSTEM_COLUMNS:
            raise ConfigError(
                f"TopKTransform: {what} column {col!r} not in parent schema"
            )
    if cfg.k < 1:
        raise ConfigError(f"TopKTransform: k must be >= 1, got {cfg.k}")
    fields = [
        T.StructField(C.ENTRY_ID, T.StringType(), False),
        T.StructField(C.SOURCE_ENTRY_ID, T.StringType(), True),
        T.StructField(C.SEQ, T.LongType(), False),
        T.StructField(C.GROUP_KEY, T.StringType(), True),
    ]
    fields += [f for f in parent.fields if f.name not in C.SYSTEM_COLUMNS]
    return T.StructType(fields)


def to_child(cfg: TopKTransformConfig, parent_rows: DataFrame) -> DataFrame:
    """Parent rows in the child's column layout (minus ``_entryId`` —
    the engine assigns ids to the rows that actually survive ranking)."""
    data_cols = [
        f.name for f in parent_rows.schema.fields if f.name not in C.SYSTEM_COLUMNS
    ]
    return parent_rows.select(
        F.col(C.ENTRY_ID).alias(C.SOURCE_ENTRY_ID),
        F.col(C.SEQ),
        key_expr(cfg.group_by).alias(C.GROUP_KEY),
        *data_cols,
    )


def ranked(cfg: TopKTransformConfig, rows: DataFrame) -> DataFrame:
    """``rows`` plus their ``_rn`` rank — one keyed window shuffle on
    the group hash (the same economics as any groupBy). Rank order:
    ``order_by`` (direction per config), then arrival (``_seq``, unique
    per row, so the order is total and deterministic).

    NULL handling (ADVICE r7): NULL ``order_by`` values rank LAST in
    BOTH directions — explicitly ``desc_nulls_last`` /
    ``asc_nulls_last``, never Spark's direction-dependent default
    (plain ``asc`` ranks NULLs FIRST, which would let NULL rows fill
    the k slots ahead of real values on ascending top-k and diverge
    from the documented lowest-first semantics and from SQL oracles,
    where DuckDB defaults to NULLS LAST either way)."""
    from pyspark.sql.window import Window

    lead = (
        F.col(cfg.order_by).desc_nulls_last()
        if cfg.descending
        else F.col(cfg.order_by).asc_nulls_last()
    )
    w = Window.partitionBy(C.GROUP_KEY).orderBy(lead, C.SEQ)
    return rows.withColumn("_rn", F.row_number().over(w))


def topk(cfg: TopKTransformConfig, rows: DataFrame) -> DataFrame:
    """The k best rows per group among ``rows`` (see :func:`ranked`)."""
    return ranked(cfg, rows).filter(F.col("_rn") <= cfg.k).drop("_rn")
